"""Mosaic (Pallas-on-TPU) triage for this remote TPU attachment.

Round 3 found the fused chop kernel rejected by the remote Mosaic compiler
("failed to legalize operation 'func.return'") and a minimal two-output u32
probe stalled >10 min in remote compile (PROFILE.md).  VERDICT round-3 item
2 asks for a systematic triage: single-output kernels, (8,128)-aligned
blocks, scalar-prefetch-free grids — each probe in its OWN subprocess with
a hard timeout so a compiler stall cannot wedge the harness.

Usage:
  python tools/mosaic_triage.py            # run all tiers, print table
  python tools/mosaic_triage.py <name>     # run ONE probe in-process
                                           # (used internally)

Results land in tools/mosaic_triage_results.json.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TIMEOUT_S = 300


# --------------------------------------------------------------------------
# probes: each returns True on exact output, raises/exits nonzero otherwise
# --------------------------------------------------------------------------

def probe_copy_f32():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 2.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert np.allclose(np.asarray(out), np.asarray(x) * 2.0)


def probe_copy_u32():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:] + jnp.uint32(7)

    x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert np.array_equal(np.asarray(out), np.asarray(x) + 7)


def probe_shift_u32():
    """VPU integer shifts/or — the ops the chop kernel needs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(i_ref, o_ref):
        v = i_ref[:]
        o_ref[:] = ((v << jnp.uint32(2)) | (v >> jnp.uint32(30))) ^ v

    x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = np.asarray(x)
    exp = ((ref << 2) | (ref >> 30)) ^ ref
    assert np.array_equal(np.asarray(out), exp)


def probe_two_out_u32():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(i_ref, a_ref, b_ref):
        a_ref[:] = i_ref[:] + jnp.uint32(1)
        b_ref[:] = i_ref[:] * jnp.uint32(3)

    x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    a, b = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(x)
    assert np.array_equal(np.asarray(a), np.asarray(x) + 1)
    assert np.array_equal(np.asarray(b), np.asarray(x) * 3)


def probe_grid_block():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:] + jnp.float32(pl.program_id(0) == pl.program_id(0))

    M, N, T = 64, 256, 8
    x = jnp.arange(M * N, dtype=jnp.float32).reshape(M, N)
    out = pl.pallas_call(
        kernel,
        grid=(M // T,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec((T, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)
    assert np.allclose(np.asarray(out), np.asarray(x) + 1.0)


def probe_bitonic_stage():
    """One compare-exchange stage on u32 rows — the building block of a
    VMEM-local bitonic merge sort (PROFILE.md item 5, the ~90x lever)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(i_ref, o_ref):
        a = i_ref[0:8, :]
        b = i_ref[8:16, :]
        o_ref[0:8, :] = jnp.minimum(a, b)
        o_ref[8:16, :] = jnp.maximum(a, b)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2 ** 32, size=(16, 128), dtype=np.uint32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = np.asarray(x)
    exp = np.concatenate([np.minimum(ref[:8], ref[8:]),
                          np.maximum(ref[:8], ref[8:])])
    assert np.array_equal(np.asarray(out), exp)


def probe_fori_sort_net():
    """fori_loop + iota + where inside a kernel: a full 32-lane bitonic
    sort network along the LANE axis of an (8,128) u32 tile, checked
    against jnp.sort."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 128

    def kernel(i_ref, o_ref):
        v = i_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)

        def stage(v, dist, up_block):
            partner = lane ^ dist
            pv = pltpu.roll(v, -dist, 1)
            pv = jnp.where(lane < partner, pv, pltpu.roll(v, dist, 1))
            up = (lane & up_block) == 0
            lo = jnp.where(lane < partner, v, pv)
            hi = jnp.where(lane < partner, pv, v)
            mn = jnp.minimum(lo, hi)
            mx = jnp.maximum(lo, hi)
            keep_small = (lane < partner) == up
            return jnp.where(keep_small, mn, mx)

        k = 2
        while k <= W:
            v = stage(v, k >> 1, k)
            j = k >> 2
            while j >= 1:
                v = stage(v, j, k)
                j >>= 1
            k <<= 1
        o_ref[:] = v

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 2 ** 32, size=(8, W), dtype=np.uint32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    exp = np.sort(np.asarray(x), axis=1)
    assert np.array_equal(np.asarray(out), exp), "sort network mismatch"


def probe_chop_kernel():
    """The round-3 fused chop kernel (ops/pallas_chop.py) that Mosaic
    rejected — re-test as-is."""
    import numpy as np
    import jax.numpy as jnp
    from dbg_assembly_tpu.kmer import count as kc

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(256, 150)).astype(np.uint8)
    lengths = np.full(256, 150, np.int32)
    s, u, v = kc.count_spectrum_fast_pallas(
        jnp.asarray(codes), jnp.asarray(lengths), 31)
    s2, u2, v2 = kc.count_spectrum_fast(
        jnp.asarray(codes), jnp.asarray(lengths), 31)
    assert int(u) == int(u2) and int(v) == int(v2)
    assert np.array_equal(np.asarray(s), np.asarray(s2))


PROBES = {
    "copy_f32": probe_copy_f32,
    "copy_u32": probe_copy_u32,
    "shift_u32": probe_shift_u32,
    "two_out_u32": probe_two_out_u32,
    "grid_block": probe_grid_block,
    "bitonic_stage": probe_bitonic_stage,
    "fori_sort_net": probe_fori_sort_net,
    "chop_kernel": probe_chop_kernel,
}


def main():
    if len(sys.argv) > 1:
        # child mode: run one probe against the real TPU
        name = sys.argv[1]
        PROBES[name]()
        print(f"PROBE {name} OK")
        return

    results = {}
    for name in PROBES:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=TIMEOUT_S)
            ok = r.returncode == 0 and f"PROBE {name} OK" in r.stdout
            err = "" if ok else (r.stderr.strip().splitlines() or ["?"])[-1]
            results[name] = {"ok": ok, "sec": round(time.time() - t0, 1),
                             "err": err[:300]}
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "sec": TIMEOUT_S,
                             "err": f"TIMEOUT after {TIMEOUT_S}s "
                                    "(remote compile stall)"}
        print(f"{name:16s} {'OK  ' if results[name]['ok'] else 'FAIL'} "
              f"{results[name]['sec']:7.1f}s  {results[name]['err'][:120]}",
              flush=True)
    with open(os.path.join(ROOT, "tools", "mosaic_triage_results.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
