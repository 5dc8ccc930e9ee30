"""The bucketed (VMEM-tiled) counting pipeline must agree exactly with the
reference-grade single-sort counter on spectrum, species and totals."""

import numpy as np

import bucket
from dbg_assembly_tpu.kmer import count as kc


def _reference_counts(codes, lengths, k):
    u, c, total = kc.count_batch(codes, lengths, k)
    return dict(zip(u.tolist(), c.tolist())), total


def test_bucket_spectrum_matches_reference():
    rng = np.random.default_rng(0)
    k = 21
    N, L = 700, 90
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    # plant heavy duplication so counts > 1 exist
    codes[200:400] = codes[0:200]
    codes[400:450] = codes[0:50]
    lengths = rng.integers(k, L + 1, size=N).astype(np.int32)
    lengths[200:400] = lengths[0:200]
    lengths[400:450] = lengths[0:50]

    ref, ref_total = _reference_counts(codes, lengths, k)
    ref_spec = np.zeros(256, np.int64)
    for c in ref.values():
        ref_spec[min(c, 255)] += 1

    spec, n_unique, n_valid, ovf = bucket.count_spectrum(
        codes, lengths, ksize=k, B=32, S=4096, max_freq=255)
    assert not bool(ovf)
    assert int(n_valid) == ref_total
    assert int(n_unique) == len(ref)
    np.testing.assert_array_equal(np.asarray(spec), ref_spec)


def test_bucket_unique_matches_reference():
    rng = np.random.default_rng(3)
    k = 17
    N, L = 300, 70
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    codes[100:200] = codes[0:100]
    lengths = np.full(N, L, np.int32)

    ref, ref_total = _reference_counts(codes, lengths, k)
    uniq, counts, n_unique, n_valid, ovf = bucket.count_unique(
        codes, lengths, ksize=k, B=16, S=2048)
    assert not bool(ovf)
    assert int(n_unique) == len(ref)
    u = np.asarray(uniq).reshape(-1)
    c = np.asarray(counts).reshape(-1)
    keep = u != bucket.SENTINEL
    got = dict(zip(u[keep].tolist(), c[keep].tolist()))
    assert got == ref


def test_bucket_overflow_flag():
    # all-identical reads -> every k-mer species in one bucket
    k = 15
    codes = np.tile(np.array([0, 1, 2, 3], np.uint8), (64, 16))
    lengths = np.full(64, 64, np.int32)
    _, _, _, ovf = bucket.count_spectrum(
        codes, lengths, ksize=k, B=64, S=512, cap=8)
    assert bool(ovf)
