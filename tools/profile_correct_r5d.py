"""Round-5 correction profiler D: BBT per-trip cost scaling.

One rightward BBT call, varying rows N, span (trip count) and unroll, to
identify what the ~8-21 ms/trip actually is: row-compute (cost ~ N),
fixed per-iteration overhead (cost ~ trips, flat in N), or probe gathers.

Run: python -u tools/profile_correct_r5d.py 2>&1 | tee /tmp/correct_r5d.log
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from dbg_assembly_tpu.correct import device as dev

K = 17
L = 250


def main():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from bench_stages import make_pe250
    from profile_correct_r5 import build_bitmap_device

    ascii_np, codes, lengths, _ = make_pe250(8192)
    bmd = jax.block_until_ready(build_bitmap_device(codes, lengths, K))
    print("bitmap ready", flush=True)

    def run_cfg(n, span, unroll, iters_hi=6, iters_lo=1):
        ab = jnp.asarray(ascii_np[:n])
        lb = jnp.asarray(lengths[:n])
        act = jnp.ones((n,), bool)
        cs = jnp.full((n,), 239 - span, jnp.int32)
        ce = jnp.full((n,), 239, jnp.int32)
        ma = jnp.full((n,), 2, jnp.int32)
        lc = jnp.full((n,), -1, jnp.int32)

        @jax.jit
        def loop(bm, a, l_, it):
            def step(i, acc):
                a2, num, lnt, lch, ovf = dev._bbt_batch(
                    jnp.roll(a, i, axis=0), l_, bm, act, cs, ce, ma, lc,
                    k=K, rightward=True, is_modify_trimmed=False,
                    unroll=unroll)
                return (acc + jnp.sum(num + lnt).astype(jnp.int64)
                        + a2[0, 0].astype(jnp.int64)
                        + jnp.sum(ovf).astype(jnp.int64))
            return jax.lax.fori_loop(0, it, step, jnp.int64(0))

        t0 = time.perf_counter()
        float(np.asarray(loop(bmd, ab, lb, 1)))
        ct = time.perf_counter() - t0
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(loop(bmd, ab, lb, iters_hi)))
            hi = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(loop(bmd, ab, lb, iters_lo)))
            lo = time.perf_counter() - t0
            per = (hi - lo) / (iters_hi - iters_lo)
            best = per if best is None else min(best, per)
        print(f"N={n:5d} span={span:3d} unroll={unroll}  "
              f"{best*1e3:9.1f} ms/call  "
              f"{best*1e3/max(span,1):7.3f} ms/trip  [compile {ct:.0f}s]",
              flush=True)
        return best

    run_cfg(8192, 200, 1)
    run_cfg(8192, 25, 1)
    run_cfg(1024, 200, 1)
    run_cfg(8192, 200, 4)
    run_cfg(8192, 200, 8)


if __name__ == "__main__":
    main()
