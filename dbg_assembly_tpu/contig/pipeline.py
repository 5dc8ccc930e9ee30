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
        readout: str = "exact"):
    """readout="exact" replays the reference serially (byte-exact files);
    readout="doubling" runs the scalable bulk-pruning + pointer-doubling
    assembler (record-exact; file order may differ on length ties)."""
    from ..io import fastq

    if params is None:
        params = AssembleParams(ksize=ksize)
    params.ksize = ksize
    files = read_file_list(lib_file)
    gb = GraphBuilder(ksize, max_read_len)
    for path in files:
        batch = fastq.read_batch(path, fmt="fq" if fmt == 1 else "fa",
                                 strict_n=False, keep_heads=False)
        gb.add(batch.codes, batch.lengths)
    table = gb.finalize()
    if readout == "doubling":
        from .pointer_doubling import assemble_doubling
        return assemble_doubling(table, params, prefix)
    asm = RefAssembler(table, params)
    stats = asm.run(prefix)
    return stats
