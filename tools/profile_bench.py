"""One-off: break down where the counting bench time goes on the real TPU.

Times each stage of the bench loop (chop, u64 sort, count_stats histogram,
and some sort variants) inside its own jitted fori_loop, device-resident,
differencing two iteration counts to cancel tunnel dispatch latency.
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
from dbg_assembly_tpu.kmer import count as kc

KSIZE = 31
READ_LEN = 150
P = READ_LEN - KSIZE + 1

DATA_DIR = os.path.join(ROOT, "tests", "_golden_cache", "bench")
codes = np.load(os.path.join(DATA_DIR, "codes.npy"))[:250_000]
lengths = np.full(len(codes), READ_LEN, np.int32)
cb = jnp.asarray(codes)
lb = jnp.asarray(lengths)
N_TOTAL = len(codes) * P
print(f"batch kmers: {N_TOTAL/1e6:.1f}M", flush=True)


def timeit(name, fn, hi=6, lo=1):
    jfn = jax.jit(fn, static_argnums=(1,))
    float(np.asarray(jfn(cb, 1)))
    t0 = time.perf_counter(); float(np.asarray(jfn(cb, hi))); d_hi = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(jfn(cb, lo))); d_lo = time.perf_counter() - t0
    per = (d_hi - d_lo) / (hi - lo)
    print(f"{name:30s} {per*1e3:9.1f} ms/iter  -> {N_TOTAL/per/1e6:9.1f} Mkmer/s", flush=True)
    return per


def loop(body):
    def fn(c, iters):
        def b(i, acc):
            c2 = jnp.roll(c, i, axis=0)
            return acc + body(c2)
        return jax.lax.fori_loop(0, iters, b, jnp.int64(0))
    return fn


def chop_only(c):
    flat, n_valid = kc.chop_canonical(c, lb, KSIZE)
    return jnp.int64(flat[0] & jnp.uint64(1)) + n_valid


def chop_sort(c):
    flat, n_valid = kc.chop_canonical(c, lb, KSIZE)
    flat = jnp.sort(flat)
    return jnp.int64(flat[0] & jnp.uint64(1)) + n_valid


def full(c):
    flat, n_valid = kc.chop_canonical(c, lb, KSIZE)
    flat = jnp.sort(flat)
    spectrum, n_unique, _ = kc.count_stats(flat, max_freq=255)
    return spectrum[1] + n_unique + n_valid


def chop_sort2key(c):
    flat, n_valid = kc.chop_canonical(c, lb, KSIZE)
    hi = (flat >> jnp.uint64(32)).astype(jnp.uint32)
    lo = flat.astype(jnp.uint32)
    hi2, lo2 = jax.lax.sort((hi, lo), num_keys=2)
    return jnp.int64(hi2[0] & jnp.uint32(1)) + jnp.int64(lo2[0] & jnp.uint32(1)) + n_valid


def chop_sort32(c):
    # lower bound: what a single 32-bit sort of the same volume costs
    flat, n_valid = kc.chop_canonical(c, lb, KSIZE)
    lo = flat.astype(jnp.uint32)
    lo = jnp.sort(lo)
    return jnp.int64(lo[0] & jnp.uint32(1)) + n_valid


def stats_only_input():
    flat, _ = kc.chop_canonical(cb, lb, KSIZE)
    return jnp.sort(flat)


timeit("chop only", loop(chop_only))
timeit("chop + u64 sort", loop(chop_sort), hi=4)
timeit("chop + 2key u32 sort", loop(chop_sort2key), hi=4)
timeit("chop + u32 sort (lower bnd)", loop(chop_sort32), hi=4)
timeit("full (chop+sort+stats)", loop(full), hi=4)

sorted_flat = stats_only_input()
sorted_flat.block_until_ready()


def stats_only(c, iters):
    def b(i, acc):
        x = jnp.roll(sorted_flat, 0)
        spectrum, n_unique, _ = kc.count_stats(x, max_freq=255)
        return acc + spectrum[1] + n_unique + i
    return jax.lax.fori_loop(0, iters, b, jnp.int64(0))


timeit("count_stats only", stats_only, hi=4)
print("done", flush=True)
