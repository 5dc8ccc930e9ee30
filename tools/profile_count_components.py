"""Profile the components of the counting bench on the real TPU.

Times each stage of the current pipeline in isolation (inside one jitted
fori_loop each, syncing once) so we know what to attack for the >=50x
target.  Run: python -u tools/profile_count_components.py
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from dbg_assembly_tpu import dna
from dbg_assembly_tpu.kmer import count as kc

KSIZE = 31
READ_LEN = 150
P = READ_LEN - KSIZE + 1
BATCH = 250_000
N = BATCH * P  # number of kmers per iteration


def timed(name, fn, *args, iters_hi=8, iters_lo=2, unit_n=N):
    print(f"[compile] {name}", flush=True)
    t0 = time.perf_counter()
    jfn = jax.jit(fn, static_argnames=("iters",))
    float(np.asarray(jfn(*args, iters=1)))  # compile+warm
    print(f"[compiled in {time.perf_counter()-t0:.1f}s]", flush=True)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, iters=iters_hi)))
        hi = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, iters=iters_lo)))
        lo = time.perf_counter() - t0
        per = (hi - lo) / (iters_hi - iters_lo)
        best = per if best is None else min(best, per)
    rate = unit_n / best
    print(f"{name:32s} {best*1e3:9.2f} ms/iter  {rate/1e6:9.1f} M keys/s",
          flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(BATCH, READ_LEN), dtype=np.uint8)
    lengths = np.full(BATCH, READ_LEN, np.int32)
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)

    # flat u64 canonical kmers, unsorted + sorted, for isolated stages
    flat_unsorted = None

    def mk_flat(c, l_):
        kmers = dna.rolling_kmers(c, KSIZE)
        can, _ = dna.canonical(kmers, KSIZE)
        pos = jnp.arange(P, dtype=jnp.int32)[None, :]
        valid = pos < (l_[:, None] - KSIZE + 1)
        return jnp.where(valid, can, kc.SENTINEL).reshape(-1)

    print("computing flat kmers...", flush=True)
    t0 = time.perf_counter()
    flat_unsorted = jax.jit(mk_flat)(cb, lb)
    flat_unsorted.block_until_ready()
    print(f"flat done {time.perf_counter()-t0:.1f}s; sorting...", flush=True)
    t0 = time.perf_counter()
    flat_sorted = jax.jit(jnp.sort)(flat_unsorted)
    flat_sorted.block_until_ready()
    print(f"sorted {time.perf_counter()-t0:.1f}s", flush=True)
    print(f"N = {N/1e6:.1f} M kmers per iter", flush=True)

    def loop(body):
        def f(*args, iters):
            def b(i, acc):
                return acc + body(i, *args)
            return jax.lax.fori_loop(0, iters, b, jnp.uint64(0))
        return f

    # 1. chop+canonical only
    def chop_body(i, c, l_):
        c2 = jnp.roll(c, i, axis=0)
        flat = mk_flat(c2, l_)
        return flat[0] + flat[-1]
    timed("chop+canonical", loop(chop_body), cb, lb)

    # 2. u64 sort only
    def sort_body(i, f):
        f2 = f ^ jnp.uint64(i)  # perturb to avoid caching
        s = jnp.sort(f2)
        return s[0] + s[-1]
    timed("sort u64 30M", loop(sort_body), flat_unsorted)

    # 3. count_stats only (includes its own i32 sort)
    def stats_body(i, f):
        spectrum, n_unique, n_valid = kc.count_stats(f, max_freq=255)
        return (spectrum[1] + n_unique + n_valid).astype(jnp.uint64) + i
    timed("count_stats (sorted in)", loop(stats_body), flat_sorted)

    # 4. u32 sort, same count
    w32 = jnp.asarray(
        rng.integers(0, 2**32, size=N, dtype=np.uint64).astype(np.uint32))

    def sort32_body(i, f):
        f2 = f ^ jnp.uint32(i)
        s = jnp.sort(f2)
        return (s[0] + s[-1]).astype(jnp.uint64)
    timed("sort u32 30M", loop(sort32_body), w32)

    # 5. row-sort [4096, 7424] u32 (same total)
    rows = 4096
    capc = N // rows
    w32r = w32[: rows * capc].reshape(rows, capc)

    def rowsort_body(i, f):
        f2 = f ^ jnp.uint32(i)
        s = jnp.sort(f2, axis=-1)
        return (s[0, 0] + s[-1, -1]).astype(jnp.uint64)
    timed("row-sort 4096x7424 u32", loop(rowsort_body), w32r, unit_n=rows*capc)

    # 5b. row-sort u64 [4096, 7424]
    w64r = flat_unsorted[: rows * capc].reshape(rows, capc)

    def rowsort64_body(i, f):
        f2 = f ^ jnp.uint64(i)
        s = jnp.sort(f2, axis=-1)
        return s[0, 0] + s[-1, -1]
    timed("row-sort 4096x7424 u64", loop(rowsort64_body), w64r,
          unit_n=rows*capc)

    # 6. full current bench body
    def full_body(i, c, l_):
        c2 = jnp.roll(c, i, axis=0)
        flat, n_valid = kc.chop_canonical(c2, l_, KSIZE)
        flat = jnp.sort(flat)
        spectrum, n_unique, _ = kc.count_stats(flat, max_freq=255)
        return (spectrum[1] + n_unique + n_valid).astype(jnp.uint64)
    timed("FULL current bench body", loop(full_body), cb, lb,
          iters_hi=6, iters_lo=2)


if __name__ == "__main__":
    main()
