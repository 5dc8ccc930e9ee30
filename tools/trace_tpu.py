"""jax.profiler trace harness for the counting/ingest hot path.

Captures a device trace (TensorBoard/Perfetto format) of the production
counting step so per-op device time can be inspected — the programmatic
complement to the stage-budget tables in PROFILE.md.

Run:  python -u tools/trace_tpu.py [outdir] [batch]
Open: tensorboard --logdir <outdir>   (or load the .perfetto trace)

On the axon remote-TPU attachment trace capture may be unsupported; the
tool then falls back to wall-clock stage timing and says so.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main(outdir="/tmp/dbg_trace", batch=250_000):
    import jax
    import jax.numpy as jnp
    from dbg_assembly_tpu.kmer import count as kc

    KSIZE, READ_LEN = 31, 150
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=3_000_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - READ_LEN, size=batch)
    codes = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
    lengths = np.full(batch, READ_LEN, np.int32)
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)
    jax.block_until_ready(cb)

    @jax.jit
    def step(c, l_):
        spectrum, n_unique, n_valid = kc.count_spectrum_fast(
            c, l_, KSIZE, max_freq=255)
        return spectrum[1] + n_unique + n_valid

    float(np.asarray(step(cb, lb)))      # compile + warm
    os.makedirs(outdir, exist_ok=True)
    try:
        with jax.profiler.trace(outdir):
            for _ in range(3):
                float(np.asarray(step(cb, lb)))
        print(f"trace written to {outdir}")
    except Exception as e:  # tunnel backends may not support capture
        print(f"trace capture unavailable on this backend ({e!r}); "
              "falling back to wall timing")
        t0 = time.perf_counter()
        for _ in range(3):
            float(np.asarray(step(cb, lb)))
        print(f"3 steps: {time.perf_counter() - t0:.3f}s wall "
              "(includes per-call dispatch; see bench.py for the "
              "dispatch-cancelled number)")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/dbg_trace"]),
         *(int(a) for a in sys.argv[2:3]))
