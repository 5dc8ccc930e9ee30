"""Gather-free counting statistics over a sorted k-mer vector.

Round-2 profiling (PROFILE.md) showed count_stats' spectrum tail — a SECOND
full sort of the 37M capped run-lengths plus a searchsorted — costs ~130 ms
on the TPU, dragging the counting pipeline from 35x to 23x the reference.
This module computes the identical spectrum with one reverse-cummin pass
(run lengths) and a fused compare-reduce histogram (no sort, no gather, no
scatter): the histogram is O(N * nbins) VPU compares, which XLA fuses into
the reduction, ~2.4 GB of effective traffic instead of a 300 MB sort's
many comparator passes.

Reference semantics matched: spectrum bin f = number of k-mer species whose
count (saturated at max_freq) equals f; bin 0 is always zero (species counts
are >= 1) — kmerfreq's 255-cap .cz table as consumed by
correct_error/main.cpp:187-215.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)

_CHUNK = 1 << 20


@functools.partial(jax.jit, static_argnames=("nbins",))
def histogram_small(v: jnp.ndarray, nbins: int = 256) -> jnp.ndarray:
    """Histogram of int32 values into [0, nbins); out-of-range values are
    dropped.  Scatter-free: chunked compare-reduce the VPU runs at
    elementwise speed (a 1-elem-per-update scatter of a 37M stream is ~10x
    the cost of the whole pipeline on TPU)."""
    n = v.shape[0]
    pad = (-n) % _CHUNK
    if pad:
        v = jnp.concatenate([v, jnp.full((pad,), -1, v.dtype)])
    vc = v.reshape(-1, _CHUNK)
    bins = jnp.arange(nbins, dtype=v.dtype)

    def body(acc, row):
        h = jnp.sum((row[:, None] == bins[None, :]).astype(jnp.int32),
                    axis=0)
        return acc + h.astype(jnp.int64), None

    out, _ = jax.lax.scan(body, jnp.zeros((nbins,), jnp.int64), vc)
    return out


def histogram256(v: jnp.ndarray) -> jnp.ndarray:
    return histogram_small(v, 256)


@functools.partial(jax.jit, static_argnames=("max_freq",))
def spectrum_sorted(sorted_kmers: jnp.ndarray, max_freq: int = 255):
    """Spectrum histogram + species count from a sorted k-mer vector.

    Identical contract to kmer.count.count_stats' (spectrum, n_unique) but
    without the second sort: run lengths via one reverse cummin of boundary
    indices, histogram via compare-reduce.  Returns
    (spectrum [max_freq+1] int64 with spectrum[0] == 0, n_unique int64).
    """
    x = sorted_kmers
    n = x.shape[0]
    valid = x != SENTINEL
    idx = jnp.arange(n, dtype=jnp.int64)
    first = jnp.concatenate([jnp.ones((1,), bool), x[1:] != x[:-1]]) & valid
    to_invalid = jnp.concatenate([jnp.zeros((1,), bool),
                                  valid[:-1] & ~valid[1:]])
    boundary = first | to_invalid
    fidx = jnp.where(boundary, idx, n)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([fidx[1:], jnp.array([n], jnp.int64)]))))
    counts = nxt - idx
    n_unique = jnp.sum(first.astype(jnp.int64))
    capped = jnp.clip(counts, 1, max_freq).astype(jnp.int32)
    capped = jnp.where(first, capped, -1)      # non-first -> no bin
    spectrum = histogram_small(capped, max_freq + 1)
    return spectrum, n_unique
