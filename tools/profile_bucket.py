"""Measure the bucketed counting pipeline on the real TPU."""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, 'tools', 'bucket_lab'))

import jax
import jax.numpy as jnp

import bucket

KSIZE = 31
READ_LEN = 150
BATCH = 250_000
P = READ_LEN - KSIZE + 1
N = BATCH * P


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(BATCH, READ_LEN), dtype=np.uint8)
    lengths = np.full(BATCH, READ_LEN, np.int32)
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)

    configs = [(512, 32768), (1024, 32768), (512, 16384), (256, 65536)]
    for B, S in configs:
        @jax.jit
        def loop(c, l_, iters):
            def body(i, acc):
                c2 = jnp.roll(c, i, axis=0)
                spec, n_unique, n_valid, ovf = bucket.count_spectrum(
                    c2, l_, ksize=KSIZE, B=B, S=S, max_freq=255)
                return acc + spec[1] + n_unique + n_valid \
                    + ovf.astype(jnp.int64)
            return jax.lax.fori_loop(0, iters, body, jnp.int64(0))

        print(f"[compile] B={B} S={S}", flush=True)
        t0 = time.perf_counter()
        v = float(np.asarray(loop(cb, lb, 1)))
        print(f"[compiled+1it {time.perf_counter()-t0:.1f}s] check={v}",
              flush=True)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(loop(cb, lb, 8)))
            hi = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(loop(cb, lb, 2)))
            lo = time.perf_counter() - t0
            per = (hi - lo) / 6
            best = per if best is None else min(best, per)
        print(f"B={B} S={S}: {best*1e3:8.2f} ms/iter "
              f"{N/best/1e6:8.1f} M kmers/s  ({N/best/3.419e6:.1f}x)",
              flush=True)


if __name__ == "__main__":
    main()
