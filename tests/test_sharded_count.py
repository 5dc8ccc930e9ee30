import numpy as np
import jax

from dbg_assembly_tpu.parallel import mesh as meshmod
from dbg_assembly_tpu.parallel import count_sharded
from dbg_assembly_tpu.kmer import count as kc


def test_sharded_count_matches_single_device():
    rng = np.random.default_rng(0)
    k = 15
    N, L = 512, 64
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=N).astype(np.int32)

    m = meshmod.data_mesh(8)
    cs, ls = meshmod.shard_batch(m, codes, lengths)
    P = L - k + 1
    capacity = (N // 8) * P // 8 * 2 + 64
    uniq, counts, n_unique, stats = count_sharded.count_step(
        cs, ls, ksize=k, mesh=m, capacity=capacity)

    ref_u, ref_c, ref_total = kc.count_batch(codes, lengths, k)
    assert int(stats["dropped"]) == 0
    assert int(stats["total_kmers"]) == ref_total
    assert int(stats["unique_kmers"]) == len(ref_u)

    # merge per-device runs and compare against the single-device counter
    got = {}
    un = np.asarray(uniq)
    cn = np.asarray(counts)
    nu = np.asarray(n_unique)
    for d in range(un.shape[0]):
        for i in range(int(nu[d])):
            got[int(un[d, i])] = int(cn[d, i])
    assert got == dict(zip(ref_u.tolist(), ref_c.tolist()))

    # ownership: every kmer on device d must satisfy kmer % 8 == d
    for d in range(un.shape[0]):
        vals = un[d, :int(nu[d])]
        assert np.all(vals % 8 == d)
