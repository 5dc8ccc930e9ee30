"""Round-5 correction profiler F: is the bitmap probe the per-trip cost?

Monkeypatches dev._probe with a gather-free arithmetic stand-in (same
shapes/dtypes) and times the same full-width span-200 BBT call.  If the
per-trip cost collapses, the random 2-GiB table gather dominates and the
children-share-one-word trick (all 4 children of a lane live in the same
u32 word; RC-closure makes it true leftward too) is the right lever.

Run: python -u tools/profile_correct_r5f.py 2>&1 | tee /tmp/correct_r5f.log
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


def fake_probe(bitmap, idx):
    h = idx * jnp.uint64(0x9E3779B97F4A7C15)
    return ((h >> jnp.uint64(40)) & jnp.uint64(7)) != jnp.uint64(0)


def main():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from bench_stages import make_pe250
    from profile_correct_r5 import build_bitmap_device

    ascii_np, codes, lengths, _ = make_pe250(8192)
    bmd = jax.block_until_ready(build_bitmap_device(codes, lengths, K))
    print("bitmap ready", flush=True)

    def run_cfg(name, n, span):
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
                    k=K, rightward=True, is_modify_trimmed=False)
                return (acc + jnp.sum(num + lnt).astype(jnp.int64)
                        + a2[0, 0].astype(jnp.int64)
                        + jnp.sum(ovf).astype(jnp.int64))
            return jax.lax.fori_loop(0, it, step, jnp.int64(0))

        float(np.asarray(loop(bmd, ab, lb, 1)))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(loop(bmd, ab, lb, 6)))
            hi = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(loop(bmd, ab, lb, 1)))
            lo = time.perf_counter() - t0
            per = (hi - lo) / 5
            best = per if best is None else min(best, per)
        print(f"{name:28s} N={n} span={span}  {best*1e3:9.1f} ms/call  "
              f"{best*1e3/span:7.3f} ms/trip", flush=True)

    run_cfg("real probe", 8192, 200)
    real = dev._probe
    dev._probe = fake_probe
    dev._bbt_batch.clear_cache()   # jit caches ignore global rebinding
    run_cfg("FAKE probe (no gather)", 8192, 200)
    dev._probe = real


if __name__ == "__main__":
    main()
