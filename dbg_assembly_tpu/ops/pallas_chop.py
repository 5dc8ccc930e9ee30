"""Pallas TPU kernel: rolling canonical k-mer extraction.

The chop is the per-base inner loop of the reference's ingest
(DBGgraph.cpp:64-98).  The XLA path (dna.rolling_kmers) emits k shift-or
ops over int64 lanes (emulated as i32 pairs on TPU); this kernel computes
the same values natively on 32-bit halves in VMEM:

  - k-mer = (hi, lo) uint32 pair, leftmost base highest;
  - reverse complement via the bit-parallel cascade per 32-bit word with a
    cross-word swap (the 64-bit algorithm of seqKmer.cpp:89-97 decomposed);
  - canonical = lexicographic min of the pair.

Outputs two uint32 planes [N, P] (hi, lo).  Equality with the XLA path is
unit-tested; the kernel exists as the native building block for a future
fused chop+partition kernel (see DISTRIBUTED.md scaling notes).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M2 = np.uint32(0x33333333)
M4 = np.uint32(0x0F0F0F0F)
M8 = np.uint32(0x00FF00FF)
M16 = np.uint32(0x0000FFFF)


def _rev32(x):
    """Reverse 2-bit groups within a uint32 word and complement."""
    x = ~x
    x = ((x & M2) << 2) | ((x & ~M2) >> 2)
    x = ((x & M4) << 4) | ((x & ~M4) >> 4)
    x = ((x & M8) << 8) | ((x & ~M8) >> 8)
    x = ((x & M16) << 16) | ((x & ~M16) >> 16)
    return x


def _chop_kernel(codes_ref, hi_ref, lo_ref, *, ksize: int, P: int):
    codes = codes_ref[:].astype(jnp.uint32)              # [Bn, L]
    shift = 2 * ksize - 64                               # bits above 64? <=0
    # build rolling (hi, lo) over window positions
    hi = jnp.zeros((codes.shape[0], P), jnp.uint32)
    lo = jnp.zeros((codes.shape[0], P), jnp.uint32)
    for i in range(ksize):
        c = codes[:, i:i + P]
        # 64-bit shift-left-2 then OR c: hi = hi<<2 | lo>>30; lo = lo<<2 | c
        hi = (hi << 2) | (lo >> 30)
        lo = (lo << 2) | c
    mask_bits = 2 * ksize
    if mask_bits < 64:
        if mask_bits > 32:
            hi = hi & np.uint32((1 << (mask_bits - 32)) - 1)
        else:
            hi = jnp.zeros_like(hi)
            if mask_bits < 32:
                lo = lo & np.uint32((1 << mask_bits) - 1)
    # reverse complement: full 64-bit rev2 swaps words, then >> (64-2k)
    rhi64 = _rev32(lo)
    rlo64 = _rev32(hi)
    sh = 64 - mask_bits
    if sh == 0:
        rc_hi, rc_lo = rhi64, rlo64
    elif sh < 32:
        rc_hi = rhi64 >> sh
        rc_lo = (rlo64 >> sh) | (rhi64 << (32 - sh))
    else:
        rc_hi = jnp.zeros_like(rhi64)
        rc_lo = rhi64 >> (sh - 32)
    use_fwd = (hi < rc_hi) | ((hi == rc_hi) & (lo <= rc_lo))
    hi_ref[:] = jnp.where(use_fwd, hi, rc_hi)
    lo_ref[:] = jnp.where(use_fwd, lo, rc_lo)


@functools.partial(jax.jit, static_argnames=("ksize", "block"))
def chop_canonical_pallas(codes: jnp.ndarray, ksize: int,
                          block: int = 1024):
    """[N, L] uint8 codes -> canonical k-mers as (hi, lo) uint32 [N, P].

    Internally pads the window axis to the 128-lane tile (Mosaic requires
    lane-aligned minor dimensions); padded positions compute garbage that
    the caller's validity mask already covers, and the returned planes are
    sliced back to [N, P]."""
    N, L = codes.shape
    P = L - ksize + 1
    Pp = -(-P // 128) * 128
    Lp = Pp + ksize - 1
    if Lp > L:
        codes = jnp.concatenate(
            [codes, jnp.zeros((N, Lp - L), codes.dtype)], axis=1)
    grid = (pl.cdiv(N, block),)
    out_shape = [jax.ShapeDtypeStruct((N, Pp), jnp.uint32)] * 2
    kern = functools.partial(_chop_kernel, ksize=ksize, P=Pp)
    hi, lo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((block, Lp), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block, Pp), lambda i: (i, i * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=out_shape,
    )(codes)
    return hi[:, :P], lo[:, :P]


def combine_u64(hi, lo):
    """(hi, lo) uint32 -> uint64 (host/XLA side, for interop)."""
    return (hi.astype(jnp.uint64) << np.uint64(32)) | lo.astype(jnp.uint64)
