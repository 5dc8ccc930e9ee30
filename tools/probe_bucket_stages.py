"""Stage-by-stage compile/run probe of the bucket pipeline on the TPU.

Each stage is jitted separately so a pathological remote compile can be
attributed to a specific op pattern.  Timings print as they complete.
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, 'tools', 'bucket_lab'))

import jax
import jax.numpy as jnp
import functools

import bucket

KSIZE = 31
READ_LEN = 150
BATCH = int(os.environ.get("PROBE_BATCH", "65536"))
B = int(os.environ.get("PROBE_B", "512"))
S = int(os.environ.get("PROBE_S", "32768"))
P = READ_LEN - KSIZE + 1
N = BATCH * P


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    out = jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t1 = time.perf_counter()
    # second call = steady-state
    out = fn(*args)
    out = jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t2 = time.perf_counter()
    print(f"{name:28s} compile+1st {t1-t0:7.2f}s   2nd {t2-t1:7.3f}s",
        flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(BATCH, READ_LEN), dtype=np.uint8)
    lengths = np.full(BATCH, READ_LEN, np.int32)
    print(f"BATCH={BATCH} N={N} B={B} S={S}", flush=True)
    t0 = time.perf_counter()
    cb = jnp.asarray(codes).block_until_ready()
    lb = jnp.asarray(lengths).block_until_ready()
    print(f"transfer {time.perf_counter()-t0:.1f}s", flush=True)

    cap = bucket._auto_cap(N, B)
    print(f"cap={cap}", flush=True)

    chop = jax.jit(functools.partial(bucket._chop_hash, ksize=KSIZE))
    flat, n_valid = timed("chop_hash", chop, cb, lb)

    T = -(-N // S)
    pad = T * S - N

    @jax.jit
    def tile_sort(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,), bucket.SENTINEL, jnp.uint64)])
        return jnp.sort(x.reshape(T, S), axis=1)
    tiles = timed("tile_sort", tile_sort, flat)

    shift = np.uint64(64 - int(np.log2(B)))
    edges = (jnp.arange(B, dtype=jnp.uint64) << shift)

    @jax.jit
    def boundaries(tiles):
        start = jax.vmap(lambda row: jnp.searchsorted(row, edges))(tiles)
        vcnt = jax.vmap(
            lambda row: jnp.searchsorted(row, bucket.SENTINEL))(tiles)
        return start, vcnt
    start, vcnt = timed("boundaries(searchsorted)", boundaries, tiles)

    @jax.jit
    def counts(start, vcnt):
        ends = jnp.concatenate([start[:, 1:], vcnt[:, None]], axis=1)
        ends = jnp.minimum(ends, vcnt[:, None])
        st = jnp.minimum(start, vcnt[:, None])   # clamp mirrors bucket._partition
        cnt = (ends - st).astype(jnp.int32)
        cumBT = jnp.cumsum(cnt.T, axis=1)
        return st, cnt, cumBT
    start, cnt, cumBT = timed("counts+cumsum", counts, start, vcnt)

    @jax.jit
    def marker_scatter(cnt, cumBT):
        excl = cumBT - cnt.T
        marker = jnp.zeros((B, cap + 1), jnp.int32)
        brow = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
        mcol = jnp.clip(excl, 0, cap)
        marker = marker.at[brow, mcol].add(1)
        t_idx = jnp.cumsum(marker[:, :cap], axis=1) - 1
        return t_idx
    t_idx = timed("marker scatter+cumsum", marker_scatter, cnt, cumBT)

    @jax.jit
    def big_gather(tiles, t_idx, start, cnt, cumBT):
        excl = cumBT - cnt.T
        total = cumBT[:, -1]
        s_i = jnp.arange(cap, dtype=jnp.int32)[None, :]
        in_fill = s_i < total[:, None]
        ti = jnp.clip(t_idx, 0, T - 1)
        pos = s_i - excl[jnp.arange(B)[:, None], ti]
        src = start.T[jnp.arange(B)[:, None], ti] + pos
        src = jnp.clip(src, 0, S - 1)
        return jnp.where(in_fill, tiles[ti, src], bucket.SENTINEL)
    buckets = timed("big gather", big_gather, tiles, t_idx, start, cnt, cumBT)

    @jax.jit
    def bucket_sort(b):
        return jnp.sort(b, axis=1)
    bsorted = timed("bucket row-sort", bucket_sort, buckets)

    @jax.jit
    def runlength(b):
        first, counts_ = bucket._row_runlength(b)
        return jnp.sum(first.astype(jnp.int64)), counts_
    nuniq, counts_ = timed("runlength", runlength, bsorted)

    @jax.jit
    def spectrum(counts_):
        # timing-only: unlike bucket.count_spectrum this skips the final
        # .at[0].set(0), so bin 0 includes non-species zero slots
        capped = jnp.clip(counts_, 0, 255).astype(jnp.int32)
        sc = jnp.sort(capped, axis=1)
        bins = jnp.arange(257, dtype=jnp.int32)
        e = jax.vmap(lambda row: jnp.searchsorted(row, bins))(sc)
        return jnp.sum(e[:, 1:] - e[:, :-1], axis=0)
    spec = timed("spectrum", spectrum, counts_)

    print("n_unique =", int(nuniq), "n_valid =", int(n_valid), flush=True)


if __name__ == "__main__":
    main()
