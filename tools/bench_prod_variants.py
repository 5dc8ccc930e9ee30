"""Round-4 shootout: PRODUCTION (unique, counts) counting variants on TPU.

Times, with the CLAUDE.md methodology (whole loop in ONE jitted fori_loop,
two iteration counts differenced, scalar materialized):

  fast      count_spectrum_fast        — round-3 headline (spectrum only)
  prod      count_unique_fast          — chop + 1 sort + gather-free RLE,
                                         masked (unique,counts) in place
  prod_rows count_unique_compact       — prod + rowsort pair compaction
  prod_sort2 chop + run_length         — prod + FULL pair compaction sort

Input mirrors bench.py: 250k reads x 150 bp, k=31 -> 37.5M slots.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

KSIZE = 31
READ_LEN = 150
BATCH = 250_000


def main():
    import jax
    import jax.numpy as jnp
    from dbg_assembly_tpu.kmer import count as kc

    sys.path.insert(0, os.path.join(ROOT))
    from bench import ensure_data
    ensure_data()
    codes = np.load(os.path.join(ROOT, "tests", "_golden_cache", "bench",
                                 "codes.npy"))[:BATCH]
    lengths = np.full(len(codes), READ_LEN, np.int32)
    P = READ_LEN - KSIZE + 1
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)

    def body_fast(c, l_):
        spectrum, n_unique, n_valid = kc.count_spectrum_fast(
            c, l_, KSIZE, max_freq=255)
        return spectrum[1] + n_unique + n_valid

    def body_prod(c, l_):
        uniq_m, counts_m, n_unique, n_valid = kc.count_unique_fast(
            c, l_, KSIZE)
        return (n_unique + n_valid + counts_m[12345].astype(jnp.int64)
                + (uniq_m[123] & jnp.uint64(1)).astype(jnp.int64))

    def body_prod_rows(c, l_):
        ur, cr, npr, n_unique, n_valid = kc.count_unique_compact(
            c, l_, KSIZE)
        return (n_unique + n_valid + npr[3].astype(jnp.int64)
                + cr[0, 0].astype(jnp.int64)
                + (ur[0, 0] & jnp.uint64(1)).astype(jnp.int64))

    def body_prod_sort2(c, l_):
        flat, n_valid = kc.chop_canonical(c, l_, KSIZE, sort=False)
        flat = jnp.sort(flat)
        uniq, counts, n_unique = kc.run_length(flat)
        return (n_unique + n_valid + counts[0]
                + (uniq[0] & jnp.uint64(1)).astype(jnp.int64))

    variants = [("fast", body_fast), ("prod", body_prod),
                ("prod_rows", body_prod_rows),
                ("prod_sort2", body_prod_sort2)]
    results = {}
    for name, body in variants:
        @jax.jit
        def loop(c, l_, iters, body=body):
            def step(i, acc):
                c2 = jnp.roll(c, i, axis=0)
                return acc + body(c2, l_)
            return jax.lax.fori_loop(0, iters, step, jnp.int64(0))

        t0 = time.perf_counter()
        float(np.asarray(loop(cb, lb, 1)))
        print(f"[{name}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(cb, lb, 12)))
            d_hi = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(loop(cb, lb, 2)))
            d_lo = time.perf_counter() - t0
            per_iter = max((d_hi - d_lo) / 10, 1e-9)
            rates.append(BATCH * P / per_iter)
        best = max(rates)
        results[name] = {"kmers_per_s": best,
                         "ms_per_iter": BATCH * P / best * 1e3,
                         "spread": [round(r / 1e6, 1) for r in rates]}
        print(f"[{name}] {best/1e6:.1f} M kmers/s "
              f"({BATCH*P/best*1e3:.1f} ms/iter) "
              f"spread={results[name]['spread']}", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
