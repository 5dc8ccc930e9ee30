"""Component timings of the Pallas hybrid bitonic sort (PROFILE.md round 4):
tile sort / intra-tile merge / one XLA cross stage, fori-loop-differenced
with a materialized scalar (block_until_ready under-reports on the axon
backend — CLAUDE.md)."""

import sys, os, time
sys.setrecursionlimit(100000)
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from dbg_assembly_tpu.ops import pallas_sort as ps
import functools

N_LOG, R_LOG = 25, 10
n = 1 << N_LOG
R = 1 << R_LOG
m = R * 128
T = n // m
rng = np.random.default_rng(0)
h = jnp.asarray(rng.integers(-2**31, 2**31, size=(T*R, 128), dtype=np.int32))
l = jnp.asarray(rng.integers(-2**31, 2**31, size=(T*R, 128), dtype=np.int32))

def timeit(name, fn):
    @jax.jit
    def loop(h, l, iters):
        def body(i, hl):
            a, b = hl
            a = jnp.roll(a, i, axis=0)      # defeat loop-invariant hoisting
            return fn(a, b)
        a, b = jax.lax.fori_loop(0, iters, body, (h, l))
        return (a[0, 0] + b[-1, -1]).astype(jnp.int64)
    float(np.asarray(loop(h, l, 1)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(np.asarray(loop(h, l, 8))); hi = time.perf_counter()-t0
        t0 = time.perf_counter(); float(np.asarray(loop(h, l, 2))); lo = time.perf_counter()-t0
        print(f"  raw hi(8)={hi*1e3:.1f}ms lo(2)={lo*1e3:.1f}ms", flush=True)
        best = min(best, max((hi-lo)/6, 1e-9))
    print(f"{name}: {best*1e3:.1f} ms", flush=True)

timeit("tile_sort (153 VMEM stages)", lambda a, b: ps._run_tile_kernel(
    functools.partial(ps._tile_sort_kernel, R=R), a, b, T, R))
timeit("intra_merge (17 VMEM stages)", lambda a, b: ps._run_tile_kernel(
    functools.partial(ps._intra_merge_kernel, R=R, KT=2, unbias=False), a, b, T, R))
def cross(a, b):
    af, bf = a.reshape(-1), b.reshape(-1)
    af, bf = ps._cross_stage(af, bf, m, 4*m)
    return af.reshape(T*R, 128), bf.reshape(T*R, 128)
timeit("one cross stage (XLA)", cross)
