import numpy as np

from dbg_assembly_tpu.parallel import mesh as meshmod
from dbg_assembly_tpu.parallel import count_sharded
from dbg_assembly_tpu.contig.graph import GraphBuilder


def test_distributed_graph_ingest_matches_single_device():
    rng = np.random.default_rng(0)
    k = 13
    N, L = 512, 80
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=N).astype(np.int32)

    gb = GraphBuilder(k, max_read_len=250)
    gb.add(codes, lengths)
    table = gb.finalize()

    m = meshmod.data_mesh(8)
    cs, ls = meshmod.shard_batch(m, codes, lengths)
    P = L - k + 1
    capacity = (N // 8) * P // 8 * 2 + 64
    uniq, lcnt, rcnt, n_unique, stats = count_sharded.graph_ingest_step(
        cs, ls, ksize=k, mesh=m, capacity=capacity)

    assert int(stats["dropped"]) == 0
    assert int(stats["total_kmers"]) == table.total_kmers
    assert int(stats["unique_kmers"]) == table.n_nodes

    got = {}
    un = np.asarray(uniq)
    lc = np.asarray(lcnt)
    rc = np.asarray(rcnt)
    nu = np.asarray(n_unique)
    for d in range(un.shape[0]):
        for i in range(int(nu[d])):
            got[int(un[d, i])] = (tuple(lc[d, i]), tuple(rc[d, i]))
    want = {int(table.kmers[i]): (tuple(table.lcnt[i]), tuple(table.rcnt[i]))
            for i in range(table.n_nodes)}
    assert got == want
