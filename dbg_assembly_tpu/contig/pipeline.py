"""debruijn_contig pipeline driver: TPU graph build + order-exact assembly.

CLI parity with DBG_contig/main.cpp:162-212 (flags mapped to AssembleParams);
outputs the full artifact set: .contig.seq.fa/.seq.depth, .small.*, .tip.fa,
.lowedge.fa, .bubble.fa, .kmer.freq.
"""

from __future__ import annotations

from .graph import GraphBuilder
from .refassemble import AssembleParams, RefAssembler


def read_file_list(path: str) -> list[str]:
    """Parity: DBG_contig/seqKmer.cpp:101-114 (every nonempty line)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                out.append(line)
    return out


def run(lib_file: str, prefix: str, ksize: int = 31, fmt: int = 1,
        max_read_len: int = 250, params: AssembleParams | None = None,
        readout: str = "exact", log_stream=None, log_threads: int = 10,
        log_buffer: int = 10_000, log_doublings: int = 10,
        mesh_devices: int = 0):
    """readout="exact" replays the reference serially (byte-exact files);
    readout="doubling" runs the scalable bulk-pruning + pointer-doubling
    assembler (record-exact; file order may differ on length ties).
    mesh_devices > 0 builds a jax Mesh over that many devices and runs the
    DISTRIBUTED stage: all_to_all-routed ingest (GraphBuilder mesh mode) +
    the mesh contig stage (sharded table search / links / resolve;
    implies readout="doubling" semantics, byte-identical to it).
    log_stream: emit the reference-parity cerr run log there
    (contig/runlog.py; the reference's per-block heartbeat cadence follows
    log_buffer = its -b flag, log_threads its -t)."""
    import numpy as np
    from ..io import fastq
    from .runlog import ContigRunLog, count_end_marks

    if params is None:
        params = AssembleParams(ksize=ksize)
    params.ksize = ksize
    files = read_file_list(lib_file)
    log = None
    if log_stream is not None:
        log = ContigRunLog(log_stream, params, prefix, fmt, max_read_len,
                           threads=log_threads, buffer_reads=log_buffer,
                           max_doublings=log_doublings)
        log.parameters()
        log.hash_init()
    mesh = None
    if mesh_devices:
        from ..parallel import mesh as meshmod
        mesh = meshmod.data_mesh(mesh_devices)
    gb = GraphBuilder(ksize, max_read_len, mesh=mesh)
    # file-level pipeline parallelism (SURVEY P3): the gz decode of file
    # i+1 overlaps the native ingest of file i (both release the GIL)
    from concurrent.futures import ThreadPoolExecutor

    def _read(path):
        return fastq.read_batch(path, fmt="fq" if fmt == 1 else "fa",
                                strict_n=False, keep_heads=False)

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(_read, files[0]) if files else None
        for i, path in enumerate(files):
            batch = fut.result()
            if i + 1 < len(files):
                fut = ex.submit(_read, files[i + 1])
            if log:
                log.file_start(path)
                log.file_blocks(np.minimum(batch.lengths, max_read_len),
                                ksize)
                log.file_end()
            gb.add(batch.codes, batch.lengths)
    table = gb.finalize()
    if mesh is not None:
        from .mesh_assemble import assemble_doubling_mesh
        stats = assemble_doubling_mesh(table, params, prefix, mesh)
        readout = "doubling"
    elif readout == "doubling":
        from .pointer_doubling import assemble_doubling
        stats = assemble_doubling(table, params, prefix)
    else:
        asm = RefAssembler(table, params)
        if log:
            log.hash_params(asm.size, asm.n_nodes,
                            asm.stats.hash_conflicts_occ)
        stats = asm.run(prefix)
    if log:
        if readout == "doubling":
            log.hash_params(stats.hash_size, stats.total_nodes,
                            stats.hash_conflicts_occ)
        log.links(stats)
        log.pruning(stats)
        brk, bra = count_end_marks(prefix)
        log.readout(stats, brk, bra)
    return stats
