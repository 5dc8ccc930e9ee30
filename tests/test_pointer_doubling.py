"""The XLA pointer-doubling contig readout must produce the same contig SET
as the exact host path when pruning is disabled (chains are then purely
graph-determined; only ordering/ids are order-dependent)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def canon_seq(s: bytes) -> bytes:
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    rc = s.translate(comp)[::-1]
    return min(s, rc)


def test_pointer_doubling_matches_host_chains(tmp_path):
    from tools.simulate_reads import make_genome, simulate_pe
    from dbg_assembly_tpu.contig.graph import GraphBuilder
    from dbg_assembly_tpu.contig.refassemble import (AssembleParams,
                                                     RefAssembler)
    from dbg_assembly_tpu.contig import pointer_doubling as pd
    from dbg_assembly_tpu import dna

    K = 21
    genome = make_genome(30_000, seed=5, repeat_frac=0.0)
    r1, q1, r2, q2 = simulate_pe(genome, 100, 300, 30.0, seed=6,
                                 err_start=0.0, err_end=0.0)
    codes = np.concatenate([
        dna.ascii_to_codes(r1), dna.ascii_to_codes(r2)])
    lengths = np.full(len(codes), 100, np.int32)

    gb = GraphBuilder(K, max_read_len=250)
    gb.add(codes, lengths)
    table = gb.finalize()

    # host exact path, pruning off
    params = AssembleParams(ksize=K, init_hash_size=0.001,
                            is_remove_tip=False, is_remove_lowedge=False,
                            is_remove_bubble=False, contig_len_cutoff=1)
    asm = RefAssembler(table, params)
    prefix = str(tmp_path / "host")
    asm.run(prefix)
    host_contigs = []
    with open(prefix + ".contig.seq.fa", "rb") as f:
        for line in f:
            if not line.startswith(b">"):
                host_contigs.append(line.strip())
    with open(prefix + ".contig.small.fa", "rb") as f:
        for line in f:
            if not line.startswith(b">"):
                host_contigs.append(line.strip())

    xla_contigs = pd.extract_contigs(table, K, cutoff=2)

    host_set = sorted(canon_seq(s) for s in host_contigs)
    xla_set = sorted(canon_seq(s) for s in xla_contigs)
    assert len(host_set) > 0
    assert host_set == xla_set
