"""Bucketed k-mer counting: the VMEM-tiled sort pipeline.

Why: XLA's monolithic sort of a 30M-element u64 vector on TPU costs
~260 ms (sorting-network depth log^2 n with HBM traffic per stage), while
row-wise sorts whose rows fit VMEM run the whole network on-chip at
~1.4 G keys/s (measured, tools/profile_count_components.py).  So counting
is restructured so that every sort is a VMEM row sort:

  1. chop canonical k-mers (dna.rolling_kmers — k fused vector ops);
  2. multiply by an odd constant (bijective mod 2^64 -> exact counting is
     preserved; Fibonacci hashing uniformizes the canonical-kmer skew so
     equal-width buckets balance);
  3. reshape to [T, S] tiles, row-sort (each row S*8 bytes, VMEM-resident);
  4. bucket b = hash >> (64 - log2 B).  Per-tile bucket boundaries by
     vectorized binary search over the sorted rows;
  5. gather-partition: output slot (b, s) pulls from tile t(b,s) at
     position s - cum[b,t], where t(b,s) comes from a cumsum over scattered
     tile-boundary markers (no per-element scatter anywhere);
  6. row-sort the [B, cap] buckets (VMEM again).  A species' keys are all
     in one bucket, so per-row run-length gives exact counts;
  7. spectrum = sum of per-row histograms (row-sort the clipped counts +
     row searchsorted of the bin edges) — histograms are order-independent,
     so no global sort is ever needed.

This replaces the reference's CAS hash ingest (DBG_contig/DBGgraph.cpp:
167-205) as the throughput path; sort order is by hashed key, which is
irrelevant to counting (and inverted where real k-mer values are needed:
key = hash * C^-1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from dbg_assembly_tpu import dna

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)

# odd => multiplication mod 2^64 is bijective; chosen so that no real
# (<= 62-bit) k-mer hashes to the sentinel value
_CANDIDATE_CONSTANTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                        0xFF51AFD7ED558CCD, 0x2545F4914F6CDD1D)


def _pick_constant():
    for c in _CANDIDATE_CONSTANTS:
        inv = pow(c, -1, 1 << 64)
        if (int(SENTINEL) * inv) % (1 << 64) >= (1 << 62):
            return np.uint64(c), np.uint64(inv)
    raise AssertionError("no suitable hash constant")


HASH_C, HASH_C_INV = _pick_constant()


def unhash(h):
    """Invert the multiplicative hash (key = h * C^-1 mod 2^64)."""
    xp = jnp if isinstance(h, jnp.ndarray) else np
    return (xp.asarray(h, xp.uint64) * HASH_C_INV)


def _chop_hash(codes, lengths, ksize: int):
    """[N, L] codes -> flat hashed canonical k-mers, invalid -> SENTINEL."""
    kmers = dna.rolling_kmers(codes, ksize)
    can, _ = dna.canonical(kmers, ksize)
    P = codes.shape[1] - ksize + 1
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    valid = pos < (lengths[:, None] - ksize + 1)
    h = jnp.where(valid, can * HASH_C, SENTINEL)
    n_valid = jnp.sum(valid.astype(jnp.int64))
    return h.reshape(-1), n_valid


def _partition(flat_h, *, B: int, S: int, cap: int):
    """Sorted-tile gather partition.

    flat_h: [n] hashed keys (SENTINEL padding allowed anywhere).
    Returns (buckets [B, cap] row-ascending with SENTINEL padding,
    total [B] per-bucket fill, overflow bool scalar).
    """
    n = flat_h.shape[0]
    T = -(-n // S)
    pad = T * S - n
    if pad:
        flat_h = jnp.concatenate(
            [flat_h, jnp.full((pad,), SENTINEL, jnp.uint64)])
    tiles = jnp.sort(flat_h.reshape(T, S), axis=1)          # VMEM row sorts

    shift = np.uint64(64 - int(np.log2(B)))
    edges = (jnp.arange(B, dtype=jnp.uint64) << shift)
    # start[t, b] = first index in sorted row t with hash >= edge b
    start = jax.vmap(lambda row: jnp.searchsorted(row, edges))(tiles)
    vcnt = jax.vmap(lambda row: jnp.searchsorted(row, SENTINEL))(tiles)
    ends = jnp.concatenate([start[:, 1:], vcnt[:, None]], axis=1)
    ends = jnp.minimum(ends, vcnt[:, None])
    start = jnp.minimum(start, vcnt[:, None])
    cnt = (ends - start).astype(jnp.int32)                   # [T, B]

    cumBT = jnp.cumsum(cnt.T, axis=1)                        # [B, T] inclusive
    total = cumBT[:, -1]
    excl = cumBT - cnt.T                                     # exclusive
    overflow = jnp.max(total) > cap

    # t_idx[b, s] = tile owning output slot s of bucket b: cumsum of
    # markers dropped at each tile's first slot (B*T scatter-adds, tiny)
    marker = jnp.zeros((B, cap + 1), jnp.int32)
    brow = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    mcol = jnp.clip(excl, 0, cap)
    marker = marker.at[brow, mcol].add(1)
    t_idx = jnp.cumsum(marker[:, :cap], axis=1) - 1          # [B, cap]
    s_i = jnp.arange(cap, dtype=jnp.int32)[None, :]
    in_fill = s_i < total[:, None]
    t_idx = jnp.clip(t_idx, 0, T - 1)
    pos = s_i - excl[jnp.arange(B)[:, None], t_idx]
    src = start.T[jnp.arange(B)[:, None], t_idx] + pos
    src = jnp.clip(src, 0, S - 1)
    buckets = jnp.where(in_fill, tiles[t_idx, src], SENTINEL)
    buckets = jnp.sort(buckets, axis=1)                      # VMEM row sorts
    return buckets, total, overflow


def _row_runlength(buckets):
    """Per-row run starts + run lengths over row-sorted [B, cap] keys."""
    B, cap = buckets.shape
    x = buckets
    valid = x != SENTINEL
    first = valid & jnp.concatenate(
        [jnp.ones((B, 1), bool), x[:, 1:] != x[:, :-1]], axis=1)
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    # next boundary strictly after i (per row)
    to_inv = jnp.concatenate(
        [jnp.zeros((B, 1), bool), valid[:, :-1] & ~valid[:, 1:]], axis=1)
    fidx = jnp.where(first | to_inv, idx, cap)
    nvalid_row = jnp.sum(valid, axis=1).astype(jnp.int32)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([fidx[:, 1:],
                         jnp.full((B, 1), cap, jnp.int32)], axis=1),
        axis=1), axis=1), axis=1)
    ends = jnp.minimum(nxt, nvalid_row[:, None])
    counts = jnp.where(first, ends - idx, 0)
    return first, counts


@functools.partial(jax.jit,
                   static_argnames=("ksize", "B", "S", "cap", "max_freq"))
def count_spectrum(codes, lengths, *, ksize: int, B: int = 512,
                   S: int = 32768, cap: int = 0, max_freq: int = 255):
    """Full counting pipeline: spectrum histogram + species/total counts.

    Returns (spectrum [max_freq+1] int64, n_unique, n_valid, overflow).
    cap=0 -> auto (uniform hash load + 15% slack).
    """
    N, L = codes.shape
    P = L - ksize + 1
    n = N * P
    if cap == 0:
        cap = _auto_cap(n, B)
    flat, n_valid = _chop_hash(codes, lengths, ksize)
    buckets, total, overflow = _partition(flat, B=B, S=S, cap=cap)
    first, counts = _row_runlength(buckets)
    n_unique = jnp.sum(first.astype(jnp.int64))
    capped = jnp.clip(counts, 0, max_freq).astype(jnp.int32)
    sc = jnp.sort(capped, axis=1)                            # VMEM row sorts
    bins = jnp.arange(max_freq + 2, dtype=jnp.int32)
    edges = jax.vmap(lambda row: jnp.searchsorted(row, bins))(sc)
    spectrum = jnp.sum(edges[:, 1:] - edges[:, :-1], axis=0) \
        .astype(jnp.int64)
    spectrum = spectrum.at[0].set(0)    # slot-0 zeros are not species
    return spectrum, n_unique, n_valid, overflow


@functools.partial(jax.jit, static_argnames=("ksize", "B", "S", "cap"))
def count_unique(codes, lengths, *, ksize: int, B: int = 512,
                 S: int = 32768, cap: int = 0):
    """Bucketed exact (unique k-mer, count) extraction.

    Returns (uniq [B, cap] uint64 real k-mer values grouped by hash bucket
    with SENTINEL padding, counts [B, cap] int32, n_unique, n_valid,
    overflow).  Rows are hash-ordered, not k-mer-ordered.
    """
    N, L = codes.shape
    n = N * (L - ksize + 1)
    if cap == 0:
        cap = _auto_cap(n, B)
    flat, n_valid = _chop_hash(codes, lengths, ksize)
    buckets, total, overflow = _partition(flat, B=B, S=S, cap=cap)
    first, counts = _row_runlength(buckets)
    uniq = jnp.where(first, unhash(buckets), SENTINEL)
    return uniq, counts, jnp.sum(first.astype(jnp.int64)), n_valid, overflow


def _auto_cap(n: int, B: int) -> int:
    mean = n / B
    slack = 1.15 * mean + 6.0 * np.sqrt(mean) + 64
    return int(-(-slack // 256) * 256)
