"""Pallas/XLA hybrid bitonic sort of (hi, lo) u32 pairs — the counting
pipeline's sort replacement (SURVEY section 5 "Pallas kernels for the k-mer
inner loops"; PROFILE.md item 5: XLA's monolithic u64 sort costs ~114 ms at
37.5M because every comparator stage round-trips HBM; keeping all stages
with distance < tile size in VMEM pays HBM traffic only for the ~log2(T)
cross-tile stage passes).

Decomposition of the classic bitonic network over n = 2^p elements, tiled
as T tiles of m = R*128 elements (element i lives at tile i//m, row
(i%m)//128, lane i%128):

  * stages with K <= m (all distances < m)  -> ONE Pallas kernel
    (`_tile_sort_kernel`): each tile runs the full network in VMEM,
    direction = the global network direction ((i & K) == 0); at K == m
    this is the tile-parity alternation);
  * stages with K > m, distance d >= m      -> XLA elementwise passes
    (`_cross_stage`): partner = i XOR d is a static reshape + slice swap,
    which XLA fuses into a single read+write of the planes (no gathers);
  * stages with K > m, distance d < m       -> ONE Pallas kernel per level
    (`_intra_merge_kernel`): the tile is bitonic, log2(m) stages in VMEM,
    direction constant per tile.

Mosaic constraints honored (tools/mosaic_triage.py, round 4): no unsigned
vector min/max (arith.minui does not legalize) -> keys are pre-biased to
SIGNED i32 planes (u ^ 0x80000000 preserves unsigned order); no i64 in
kernels (jax_enable_x64 is global) -> in-kernel scalars/iotas/index maps
are kept i32; pltpu.roll shifts are non-negative i32.

Compile-time shape: the stage schedule runs as fori_loops with TRACED
distances (tpu.dynamic_rotate takes an SSA shift), so Mosaic compiles ~2
stage bodies instead of the ~190-stage unrolled network (which took ~15
minutes of remote Mosaic compile; this form compiles in tens of seconds).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128          # lane width (fixed by hardware)
C_LOG = 7
BIAS = np.uint32(0x80000000)


def _swap(h, l, ph, pll, is_lower, up):
    """Finish a compare-exchange given partner values: keys compare
    lexicographically on (h, l) as signed i32 (pre-biased)."""
    gt = (h > ph) | ((h == ph) & (l > pll))
    take = gt == (is_lower == up)        # pair-equal -> partner == own
    return jnp.where(take, ph, h), jnp.where(take, pll, l)


def _lane_stage(h, l, d, up, lane):
    """Stage at TRACED lane distance d (< C).  Mosaic here cannot legalize
    lax.cond (scf.if), so lane and row stages are separate loop bodies
    instead of one cond-switched body."""
    sel = (lane & d) == 0
    fwd = jnp.int32(C) - d
    ph = jnp.where(sel, pltpu.roll(h, fwd, 1), pltpu.roll(h, d, 1))
    pll = jnp.where(sel, pltpu.roll(l, fwd, 1), pltpu.roll(l, d, 1))
    return _swap(h, l, ph, pll, sel, up)


def _row_stage(h, l, dr, up, row, R: int):
    """Stage at TRACED row distance dr (element distance dr*C)."""
    sel = (row & dr) == 0
    fwd = jnp.int32(R) - dr
    ph = jnp.where(sel, pltpu.roll(h, fwd, 0), pltpu.roll(h, dr, 0))
    pll = jnp.where(sel, pltpu.roll(l, fwd, 0), pltpu.roll(l, dr, 0))
    return _swap(h, l, ph, pll, sel, up)


def _merge_stages(h, l, k_log, up, R: int, lane, row):
    """All stages d = 2^(k_log-1) .. 1: row stages (d >= C) first, then
    lane stages — two fori_loops with traced distances."""
    one = jnp.int32(1)
    n_row = jnp.maximum(k_log - C_LOG, 0)

    def row_body(s, hl):
        h, l = hl
        dr = one << (k_log - 1 - C_LOG - s)
        return _row_stage(h, l, dr, up, row, R)

    h, l = jax.lax.fori_loop(jnp.int32(0), n_row, row_body, (h, l))
    n_lane = jnp.minimum(k_log, C_LOG)

    def lane_body(s, hl):
        h, l = hl
        d = one << (n_lane - 1 - s)
        return _lane_stage(h, l, d, up, lane)

    return jax.lax.fori_loop(jnp.int32(0), n_lane, lane_body, (h, l))


def _tile_sort_kernel(h_ref, l_ref, oh_ref, ol_ref, *, R: int):
    """All network stages with K <= m for one tile (m = R*C)."""
    m_log = R.bit_length() - 1 + C_LOG
    h = h_ref[:]
    l = l_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    t = pl.program_id(0)
    one = jnp.int32(1)

    def k_body(k_log1, hl):
        # K = 2^(k_log1 + 1); i & K with i = t*m + j reduces to j & K for
        # K < m (t*m has no bits below m) and to tile parity at K == m
        k_log = k_log1 + 1
        K = one << k_log
        j_and_K = jnp.where(k_log < C_LOG, lane & K,
                            row & (one << jnp.maximum(k_log - C_LOG, 0)))
        j_and_K = jnp.where(k_log < m_log, j_and_K,
                            jnp.broadcast_to(t & 1, (R, C)))
        up = j_and_K == 0
        return _merge_stages(hl[0], hl[1], k_log, up, R, lane, row)

    # i32 loop bounds: python-int bounds trace as i64 under x64 and
    # Mosaic's i64 convert_element_type lowering recurses forever
    h, l = jax.lax.fori_loop(jnp.int32(0), jnp.int32(m_log), k_body,
                             (h, l))
    oh_ref[:] = h
    ol_ref[:] = l


def _intra_merge_kernel(h_ref, l_ref, oh_ref, ol_ref, *, R: int, KT: int,
                        unbias: bool):
    """Stages d = m/2..1 of merge level K (tile already bitonic);
    KT = K // m, so up = ((t & KT) == 0) is constant per tile."""
    m_log = R.bit_length() - 1 + C_LOG
    h = h_ref[:]
    l = l_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    t = pl.program_id(0)
    up = (t & KT) == 0
    h, l = _merge_stages(h, l, jnp.int32(m_log), up, R, lane, row)
    if unbias:
        sbit = jnp.int32(-2147483648)
        h = h ^ sbit
        l = l ^ sbit
    oh_ref[:] = h
    ol_ref[:] = l


def _run_tile_kernel(kernel, h, l, T: int, R: int):
    # index map returns (i, i*0): with jax_enable_x64 on, a literal 0
    # traces as i64 and the lowered index-map func fails Mosaic's
    # func.return legalization (the round-3 chop-kernel mystery —
    # tools/mosaic_triage.py); deriving it from the i32 program id keeps
    # the whole signature 32-bit
    spec = pl.BlockSpec((R, C), lambda i: (i, i * 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        out_shape=(jax.ShapeDtypeStruct(h.shape, h.dtype),
                   jax.ShapeDtypeStruct(l.shape, l.dtype)),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=jax.default_backend() != "tpu",   # CPU tests interpret
    )(h, l)


def _cross_stage(h, l, dt_elems: int, K: int):
    """Compare-exchange at distance d = dt_elems (>= m, power of two) as a
    fused XLA elementwise pass: view [G, 2, d] — partner flips axis 1;
    up = (i & K) == 0 reduces to a per-group bit (K >= 2d)."""
    n = h.shape[0]
    G = n // (2 * dt_elems)
    hv = h.reshape(G, 2, dt_elems)
    lv = l.reshape(G, 2, dt_elems)
    a_h, b_h = hv[:, 0], hv[:, 1]
    a_l, b_l = lv[:, 0], lv[:, 1]
    g = jnp.arange(G, dtype=jnp.int32)
    up = ((g & (K // (2 * dt_elems))) == 0)[:, None]
    gt = (a_h > b_h) | ((a_h == b_h) & (a_l > b_l))
    lt = (b_h > a_h) | ((a_h == b_h) & (b_l > a_l))
    swap = jnp.where(up, gt, lt)
    new_ah = jnp.where(swap, b_h, a_h)
    new_bh = jnp.where(swap, a_h, b_h)
    new_al = jnp.where(swap, b_l, a_l)
    new_bl = jnp.where(swap, a_l, b_l)
    h = jnp.stack([new_ah, new_bh], axis=1).reshape(n)
    l = jnp.stack([new_al, new_bl], axis=1).reshape(n)
    return h, l


@functools.partial(jax.jit, static_argnames=("r_log",))
def sort_pairs(hi: jnp.ndarray, lo: jnp.ndarray, r_log: int = 10):
    """Sort (hi, lo) u32 pairs ascending in unsigned lexicographic order.

    hi/lo: [n] uint32 with n a power of two >= 2^(r_log+7).  Returns
    sorted (hi, lo) u32.  r_log: log2 of tile rows (tile m = 2^(r_log+7)
    elements; default 2^17 = 512 KiB/plane/tile — r_log=11 exceeds the 16 MiB scoped-VMEM limit with double buffering).
    """
    n = hi.shape[0]
    R = 1 << r_log
    m = R * C
    assert n & (n - 1) == 0 and n >= m, (n, m)
    T = n // m
    sbit = jnp.int32(-2147483648)
    h = jax.lax.bitcast_convert_type(hi, jnp.int32) ^ sbit
    l = jax.lax.bitcast_convert_type(lo, jnp.int32) ^ sbit
    h2 = h.reshape(T * R, C)
    l2 = l.reshape(T * R, C)
    h2, l2 = _run_tile_kernel(
        functools.partial(_tile_sort_kernel, R=R), h2, l2, T, R)
    K = 2 * m
    while K <= n:
        h = h2.reshape(n)
        l = l2.reshape(n)
        d = K // 2
        while d >= m:
            h, l = _cross_stage(h, l, d, K)
            d //= 2
        h2 = h.reshape(T * R, C)
        l2 = l.reshape(T * R, C)
        h2, l2 = _run_tile_kernel(
            functools.partial(_intra_merge_kernel, R=R, KT=K // m,
                              unbias=(2 * K > n)), h2, l2, T, R)
        K *= 2
    if T == 1:
        # single tile: the tile sort was the whole network; unbias here
        h2 = h2 ^ sbit
        l2 = l2 ^ sbit
    oh = jax.lax.bitcast_convert_type(h2.reshape(n), jnp.uint32)
    ol = jax.lax.bitcast_convert_type(l2.reshape(n), jnp.uint32)
    return oh, ol


def sort_u64_via_pallas(x: jnp.ndarray, r_log: int = 10):
    """Sort a u64 vector via the pair-plane Pallas sort.  Pads to the next
    power of two (>= one tile) with the all-ones sentinel, which sorts
    last; returns the sorted padded vector's first len(x) entries
    reassembled as u64."""
    n = x.shape[0]
    m = 1 << (r_log + 7)
    npad = m
    while npad < n:
        npad *= 2
    if npad != n:
        x = jnp.concatenate(
            [x, jnp.full((npad - n,), jnp.uint64(0xFFFFFFFFFFFFFFFF))])
    hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    lo = x.astype(jnp.uint32)
    oh, ol = sort_pairs(hi, lo, r_log=r_log)
    out = (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(jnp.uint64)
    return out[:n]
