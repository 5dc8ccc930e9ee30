"""Bucketed k-mer counting v2: chunked-slice partition (TPU/XLA-friendly).

Replaces kmer/bucket.py's gather-partition, whose two hot stages are
pathological on TPU (measured, tools/probe_bucket_stages.py round 3):
vmapped jnp.searchsorted costs a ~200 s XLA compile, and the element-wise
[B, cap] big gather (37 M random 2D lookups) runs ~2.4 s — slower than the
monolithic sort it was meant to replace.

The v2 partition keeps the VMEM row-sort structure but makes every memory
access contiguous:

  1. chop + multiplicative hash (bijective mod 2^64, uniformizes skew);
  2. reshape to [T, S] tiles, row-sort (each row S*8 B, VMEM-resident);
  3. per-tile bucket boundaries by a HAND-ROLLED vectorized binary search
     (log2(S) fori iterations of [T, B] take_along_axis gathers — compiles
     in seconds, unlike vmapped searchsorted);
  4. partition by per-(tile, bucket) DYNAMIC SLICES: grouped[t, b, :] =
     tiles[t, start[t,b] : start[t,b]+cap_tb] — every gather moves a
     contiguous cap_tb-element chunk, not single elements;
  5. transpose to bucket-major [B, T*cap_tb] and row-sort (VMEM again).
     A species' keys all share one bucket, so per-row run-length gives
     exact counts;
  6. spectrum via per-row sort of the clipped counts + the same manual
     binary search over bin edges (histograms are order-independent).

Per-(tile,bucket) capacity cap_tb is static; the mean load is S/B and the
hash makes it near-Poisson, so a 2x slack absorbs normal skew.  A heavy
hitter (e.g. poly-A) that overflows a chunk sets the `overflow` flag and
the caller retries at doubled cap_tb (same policy as
parallel/count_sharded._run_exact) — never a silent undercount.

This replaces the reference's CAS hash ingest (DBG_contig/DBGgraph.cpp:
167-205) as the single-chip throughput path; sort order is by hashed key,
inverted (key = hash * C^-1) where real k-mer values are needed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from bucket import HASH_C, HASH_C_INV, SENTINEL, _chop_hash, unhash  # noqa: F401


def _binary_search_rows(rows, queries):
    """Vectorized lower-bound search: rows [T, S] sorted ascending,
    queries [T, Q] -> idx [T, Q] int32 with idx = #{s : rows[t,s] < q}.

    log2(S) fori iterations of take_along_axis gathers; compiles in
    seconds where vmapped jnp.searchsorted takes minutes (TPU, measured).
    """
    T, S = rows.shape
    Q = queries.shape[1]
    # +1: ceil(log2) steps leave a width-1 interval that needs one more probe
    steps = max(int(np.ceil(np.log2(S))), 1) + 1
    lo = jnp.zeros((T, Q), jnp.int32)
    hi = jnp.full((T, Q), S, jnp.int32)

    def body(_, state):
        lo, hi = state
        open_ = lo < hi          # converged lanes must not move (a probe at
        mid = (lo + hi) // 2     # lo==hi==S would read clamped rows[S-1] and
        v = jnp.take_along_axis(  # push lo past S)
            rows, jnp.minimum(mid, S - 1).astype(jnp.int32), axis=1)
        less = (v < queries) & open_
        return (jnp.where(less, mid + 1, lo),
                jnp.where(open_ & ~less, mid, hi))

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _partition2(flat_h, *, B: int, S: int, cap_tb: int):
    """Chunked-slice partition.

    flat_h: [n] hashed keys (SENTINEL padding allowed anywhere).
    Returns (buckets [B, T*cap_tb] row-ascending with SENTINEL padding,
    overflow bool scalar).
    """
    n = flat_h.shape[0]
    T = -(-n // S)
    pad = T * S - n
    if pad:
        flat_h = jnp.concatenate(
            [flat_h, jnp.full((pad,), SENTINEL, jnp.uint64)])
    tiles = jnp.sort(flat_h.reshape(T, S), axis=1)          # VMEM row sorts

    shift = np.uint64(64 - int(np.log2(B)))
    edges = jnp.broadcast_to(
        (jnp.arange(B, dtype=jnp.uint64) << shift)[None, :], (T, B))
    start = _binary_search_rows(tiles, edges)                # [T, B]
    vcnt = _binary_search_rows(tiles, jnp.full((T, 1), SENTINEL,
                                               jnp.uint64))  # [T, 1]
    ends = jnp.concatenate([start[:, 1:], vcnt], axis=1)
    ends = jnp.minimum(ends, vcnt)
    start = jnp.minimum(start, vcnt)
    cnt = ends - start                                       # [T, B]
    overflow = jnp.max(cnt) > cap_tb

    # contiguous chunk extraction: grouped[t, b, :] = tiles_p[t, start:start+cap_tb]
    tiles_p = jnp.concatenate(
        [tiles, jnp.full((T, cap_tb), SENTINEL, jnp.uint64)], axis=1)

    def per_tile(row, st):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(row, (s,), (cap_tb,)))(st)

    grouped = jax.vmap(per_tile)(tiles_p, start)             # [T, B, cap_tb]
    j = jnp.arange(cap_tb, dtype=jnp.int32)[None, None, :]
    grouped = jnp.where(j < cnt[:, :, None], grouped, SENTINEL)
    buckets = jnp.transpose(grouped, (1, 0, 2)).reshape(B, T * cap_tb)
    buckets = jnp.sort(buckets, axis=1)                      # VMEM row sorts
    return buckets, overflow


def _row_runlength(buckets):
    """Per-row run starts + run lengths over row-sorted [B, W] keys."""
    B, W = buckets.shape
    x = buckets
    valid = x != SENTINEL
    first = valid & jnp.concatenate(
        [jnp.ones((B, 1), bool), x[:, 1:] != x[:, :-1]], axis=1)
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    to_inv = jnp.concatenate(
        [jnp.zeros((B, 1), bool), valid[:, :-1] & ~valid[:, 1:]], axis=1)
    fidx = jnp.where(first | to_inv, idx, W)
    nvalid_row = jnp.sum(valid, axis=1).astype(jnp.int32)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([fidx[:, 1:],
                         jnp.full((B, 1), W, jnp.int32)], axis=1),
        axis=1), axis=1), axis=1)
    ends = jnp.minimum(nxt, nvalid_row[:, None])
    counts = jnp.where(first, ends - idx, 0)
    return first, counts


def _row_histogram(counts, max_freq: int):
    """Per-row histogram of run lengths: sort the clipped counts per row,
    then difference bin edges found by the manual binary search.  Bin 0
    (non-first slots / zero padding) is forced to 0 — not species."""
    B = counts.shape[0]
    capped = jnp.clip(counts, 0, max_freq).astype(jnp.int32)
    sc = jnp.sort(capped, axis=1)                            # VMEM row sorts
    bins = jnp.broadcast_to(
        jnp.arange(max_freq + 2, dtype=jnp.int32)[None, :],
        (B, max_freq + 2))
    edges = _binary_search_rows(sc, bins)
    spectrum = jnp.sum(edges[:, 1:] - edges[:, :-1], axis=0) \
        .astype(jnp.int64)
    return spectrum.at[0].set(0)


@functools.partial(jax.jit,
                   static_argnames=("ksize", "B", "S", "cap_tb", "max_freq"))
def count_spectrum(codes, lengths, *, ksize: int, B: int = 512,
                   S: int = 32768, cap_tb: int = 0, max_freq: int = 255):
    """Full counting pipeline: spectrum histogram + species/total counts.

    Returns (spectrum [max_freq+1] int64, n_unique, n_valid, overflow).
    cap_tb=0 -> auto (2x the mean per-(tile,bucket) load).
    """
    if cap_tb == 0:
        cap_tb = auto_cap_tb(B, S)
    flat, n_valid = _chop_hash(codes, lengths, ksize)
    buckets, overflow = _partition2(flat, B=B, S=S, cap_tb=cap_tb)
    first, counts = _row_runlength(buckets)
    n_unique = jnp.sum(first.astype(jnp.int64))
    spectrum = _row_histogram(counts, max_freq)
    return spectrum, n_unique, n_valid, overflow


@functools.partial(jax.jit, static_argnames=("ksize", "B", "S", "cap_tb"))
def count_unique(codes, lengths, *, ksize: int, B: int = 512,
                 S: int = 32768, cap_tb: int = 0):
    """Bucketed exact (unique k-mer, count) extraction.

    Returns (uniq [B, T*cap_tb] uint64 real k-mer values grouped by hash
    bucket with SENTINEL padding, counts [B, T*cap_tb] int32, n_unique,
    n_valid, overflow).  Rows are hash-ordered, not k-mer-ordered.
    """
    if cap_tb == 0:
        cap_tb = auto_cap_tb(B, S)
    flat, n_valid = _chop_hash(codes, lengths, ksize)
    buckets, overflow = _partition2(flat, B=B, S=S, cap_tb=cap_tb)
    first, counts = _row_runlength(buckets)
    uniq = jnp.where(first, unhash(buckets), SENTINEL)
    return uniq, counts, jnp.sum(first.astype(jnp.int64)), n_valid, overflow


def auto_cap_tb(B: int, S: int) -> int:
    """Static per-(tile,bucket) chunk capacity: 2x the mean load, padded to
    a lane multiple.  Mean = S/B; the multiplicative hash makes per-chunk
    occupancy near-Poisson, so 2x mean + 6*sqrt(mean) puts the no-heavy-
    hitter overflow probability below ~1e-9 per chunk."""
    mean = S / B
    return int(-(-(2.0 * mean + 6.0 * np.sqrt(mean)) // 64) * 64)


def count_spectrum_exact(codes, lengths, *, ksize: int, B: int = 512,
                         S: int = 32768, max_freq: int = 255,
                         max_doublings: int = 4):
    """count_spectrum with the production overflow policy: retry at doubled
    cap_tb until no chunk overflows (never a silent undercount)."""
    cap_tb = auto_cap_tb(B, S)
    for _ in range(max_doublings + 1):
        spectrum, n_unique, n_valid, overflow = count_spectrum(
            codes, lengths, ksize=ksize, B=B, S=S, cap_tb=cap_tb,
            max_freq=max_freq)
        if not bool(overflow):
            return spectrum, n_unique, n_valid
        cap_tb *= 2
    raise RuntimeError(
        f"bucket chunk still overflowing at cap_tb={cap_tb}; input is "
        "pathologically skewed — fall back to kmer/count.py's "
        "monolithic-sort path")


def count_unique_exact(codes, lengths, *, ksize: int, B: int = 512,
                       S: int = 32768, max_doublings: int = 4):
    """count_unique with the retry-at-doubled-cap_tb overflow policy."""
    cap_tb = auto_cap_tb(B, S)
    for _ in range(max_doublings + 1):
        out = count_unique(codes, lengths, ksize=ksize, B=B, S=S,
                           cap_tb=cap_tb)
        if not bool(out[4]):
            return out[:4]
        cap_tb *= 2
    raise RuntimeError(
        f"bucket chunk still overflowing at cap_tb={cap_tb}; input is "
        "pathologically skewed — fall back to kmer/count.py's "
        "monolithic-sort path")
