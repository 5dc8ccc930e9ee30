import numpy as np

from dbg_assembly_tpu import dna
from dbg_assembly_tpu.contig import graph


def naive_table(codes, lengths, k, max_read_len=250):
    """Oracle mirroring DBGgraph.cpp:38-120 semantics."""
    nodes = {}
    order = []
    stream = 0
    for i in range(len(codes)):
        L = min(int(lengths[i]), max_read_len)
        if L < k:
            continue
        for j in range(L - k + 1):
            kb = int(dna.seq2bit(codes[i, j:j + k]))
            rc = int(dna.revcomp_kbit(np.uint64(kb), k))
            if kb <= rc:
                can = kb
                left = int(codes[i, j - 1]) if j > 0 else 4
                right = int(codes[i, j + k]) if j < L - k else 4
            else:
                can = rc
                right = 3 - int(codes[i, j - 1]) if j > 0 else 4
                left = 3 - int(codes[i, j + k]) if j < L - k else 4
            if can not in nodes:
                nodes[can] = [np.zeros(4, int), np.zeros(4, int), stream]
                order.append(can)
            if left != 4:
                nodes[can][0][left] += 1
            if right != 4:
                nodes[can][1][right] += 1
            stream += 1
    return nodes


def test_graph_builder_matches_oracle():
    rng = np.random.default_rng(0)
    k = 11
    N, L = 60, 50
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    lengths = rng.integers(5, L + 1, size=N).astype(np.int32)

    gb = graph.GraphBuilder(k, max_read_len=250, batch_reads=16)
    gb.add(codes, lengths)
    t = gb.finalize()
    oracle = naive_table(codes, lengths, k)

    assert t.n_nodes == len(oracle)
    for i in range(t.n_nodes):
        can = int(t.kmers[i])
        assert can in oracle
        assert np.array_equal(t.lcnt[i], oracle[can][0]), (i, can)
        assert np.array_equal(t.rcnt[i], oracle[can][1]), (i, can)

    # first-occurrence order must match the oracle's insertion order
    ins_order = [int(x) for x in
                 t.kmers[np.argsort(t.first_idx, kind="stable")]]
    oracle_order = sorted(oracle, key=lambda c: oracle[c][2])
    assert ins_order == oracle_order


def test_graph_builder_respects_max_read_len():
    rng = np.random.default_rng(1)
    k = 7
    codes = rng.integers(0, 4, size=(10, 40)).astype(np.uint8)
    lengths = np.full(10, 40, np.int32)
    gb = graph.GraphBuilder(k, max_read_len=20)
    gb.add(codes, lengths)
    t = gb.finalize()
    oracle = naive_table(codes, lengths, k, max_read_len=20)
    assert t.n_nodes == len(oracle)
    assert t.total_kmers == 10 * (20 - k + 1)
