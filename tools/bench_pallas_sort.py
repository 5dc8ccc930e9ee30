"""Measure the Pallas/XLA hybrid bitonic pair sort (ops/pallas_sort.py)
against XLA's monolithic u64 sort on the real TPU.

Stages: correctness at the full bench shape, then fori-loop-differenced
timing (CLAUDE.md methodology) of both sorts on identical data.
"""

import argparse
import os
import sys
import time

sys.setrecursionlimit(100000)   # deep pallas+cond+fori trace stacks

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-log", type=int, default=25)
    ap.add_argument("--r-log", type=int, default=11)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dbg_assembly_tpu.ops import pallas_sort as ps

    n = 1 << args.n_log
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2 ** 63, size=n, dtype=np.uint64)
    x[1000:2000] = x[0]                        # duplicates
    hi = jnp.asarray((x >> 32).astype(np.uint32))
    lo = jnp.asarray(x.astype(np.uint32))

    # ---- correctness
    t0 = time.perf_counter()
    oh, ol = ps.sort_pairs(hi, lo, r_log=args.r_log)
    oh, ol = np.asarray(oh), np.asarray(ol)
    print(f"# pallas sort compile+run+pull {time.perf_counter()-t0:.1f}s",
          flush=True)
    got = (oh.astype(np.uint64) << np.uint64(32)) | ol.astype(np.uint64)
    exp = np.sort(x)
    assert np.array_equal(got, exp), "PALLAS SORT MISMATCH"
    print("# correctness OK", flush=True)
    if args.check_only:
        return

    # ---- timing
    def time_loop(body):
        @jax.jit
        def loop(h, l, iters):
            def step(i, acc):
                h2 = jnp.roll(h, i)
                return acc + body(h2, l)
            return jax.lax.fori_loop(0, iters, step, jnp.int64(0))

        float(np.asarray(loop(hi, lo, 1)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(hi, lo, 8)))
            d_hi = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(loop(hi, lo, 2)))
            d_lo = time.perf_counter() - t0
            best = min(best, max((d_hi - d_lo) / 6, 1e-9))
        return best

    def body_pallas(h, l):
        oh, ol = ps.sort_pairs(h, l, r_log=args.r_log)
        return (oh[0] + oh[-1] + ol[12345]).astype(jnp.int64)

    def body_xla(h, l):
        x = (h.astype(jnp.uint64) << jnp.uint64(32)) | l.astype(jnp.uint64)
        s = jnp.sort(x)
        return (s[0] + s[-1] + s[12345]).astype(jnp.int64)

    def body_xla_pair(h, l):
        sh, sl = jax.lax.sort((h, l), num_keys=2)
        return (sh[0] + sh[-1] + sl[12345]).astype(jnp.int64)

    tp = time_loop(body_pallas)
    print(f"pallas pair sort  n=2^{args.n_log} r_log={args.r_log}: "
          f"{tp*1e3:.1f} ms", flush=True)
    tx = time_loop(body_xla)
    print(f"xla u64 sort      n=2^{args.n_log}: {tx*1e3:.1f} ms", flush=True)
    txp = time_loop(body_xla_pair)
    print(f"xla pair sort     n=2^{args.n_log}: {txp*1e3:.1f} ms "
          f"(speedup vs best xla: {min(tx, txp)/tp:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
