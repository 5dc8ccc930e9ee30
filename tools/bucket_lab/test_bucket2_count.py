"""The v2 chunked-slice bucket pipeline (kmer/bucket2.py) must agree exactly
with the reference-grade single-sort counter on spectrum, species, totals,
and the (unique, count) map, including through the overflow-retry wrappers."""

import numpy as np
import pytest

import bucket2
from dbg_assembly_tpu.kmer import count as kc


def _reference_counts(codes, lengths, k):
    u, c, total = kc.count_batch(codes, lengths, k)
    return dict(zip(u.tolist(), c.tolist())), total


def test_bucket2_spectrum_matches_reference():
    rng = np.random.default_rng(0)
    k = 21
    N, L = 700, 90
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    codes[200:400] = codes[0:200]
    codes[400:450] = codes[0:50]
    lengths = rng.integers(k, L + 1, size=N).astype(np.int32)
    lengths[200:400] = lengths[0:200]
    lengths[400:450] = lengths[0:50]

    ref, ref_total = _reference_counts(codes, lengths, k)
    ref_spec = np.zeros(256, np.int64)
    for c in ref.values():
        ref_spec[min(c, 255)] += 1

    spec, n_unique, n_valid, ovf = bucket2.count_spectrum(
        codes, lengths, ksize=k, B=32, S=4096, max_freq=255)
    assert not bool(ovf)
    assert int(n_valid) == ref_total
    assert int(n_unique) == len(ref)
    np.testing.assert_array_equal(np.asarray(spec), ref_spec)


def test_bucket2_unique_matches_reference():
    rng = np.random.default_rng(3)
    k = 17
    N, L = 300, 70
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    codes[100:200] = codes[0:100]
    lengths = np.full(N, L, np.int32)

    ref, ref_total = _reference_counts(codes, lengths, k)
    uniq, counts, n_unique, n_valid, ovf = bucket2.count_unique(
        codes, lengths, ksize=k, B=16, S=2048)
    assert not bool(ovf)
    assert int(n_unique) == len(ref)
    u = np.asarray(uniq).reshape(-1)
    c = np.asarray(counts).reshape(-1)
    keep = u != bucket2.SENTINEL
    got = dict(zip(u[keep].tolist(), c[keep].tolist()))
    assert got == ref


def test_bucket2_varied_tile_remainder():
    # n not divisible by S: exercise the pad-to-tiles path
    rng = np.random.default_rng(5)
    k = 15
    N, L = 123, 47
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=N).astype(np.int32)
    ref, ref_total = _reference_counts(codes, lengths, k)
    spec, n_unique, n_valid, ovf = bucket2.count_spectrum(
        codes, lengths, ksize=k, B=8, S=512)
    assert not bool(ovf)
    assert int(n_valid) == ref_total
    assert int(n_unique) == len(ref)


def test_bucket2_overflow_flag_and_exact_retry():
    # all-identical reads -> one heavy species, chunk capacity 8 overflows
    k = 15
    codes = np.tile(np.array([0, 1, 2, 3], np.uint8), (64, 16))
    lengths = np.full(64, 64, np.int32)
    _, _, _, ovf = bucket2.count_spectrum(
        codes, lengths, ksize=k, B=64, S=512, cap_tb=8)
    assert bool(ovf)
    # the exact wrapper retries at doubled cap_tb until exact
    ref, ref_total = _reference_counts(codes, lengths, k)
    spec, n_unique, n_valid = bucket2.count_spectrum_exact(
        codes, lengths, ksize=k, B=64, S=512)
    assert int(n_valid) == ref_total
    assert int(n_unique) == len(ref)
    ref_spec = np.zeros(256, np.int64)
    for c in ref.values():
        ref_spec[min(c, 255)] += 1
    np.testing.assert_array_equal(np.asarray(spec), ref_spec)


def test_bucket2_pathological_skew_raises():
    k = 15
    codes = np.tile(np.array([0, 1, 2, 3], np.uint8), (64, 16))
    lengths = np.full(64, 64, np.int32)
    with pytest.raises(RuntimeError, match="overflow"):
        # cap_tb doubling from auto can't absorb 3100 copies in 1 chunk
        # when S=128 limits a chunk to far less; force tiny budget
        bucket2.count_spectrum_exact(codes, lengths, ksize=k, B=128, S=128,
                                     max_doublings=0)
