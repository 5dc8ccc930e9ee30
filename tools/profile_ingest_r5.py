"""Round-5 profiler: ingest (_aggregate_batch) component costs + variants.

VERDICT r04 weak 2: ingest runs at 36x vs counting's 62x; the gap is the
edge-counter payload handling.  Hypotheses tested here on the real TPU:

  h1  the 2-operand sort's i64 payload costs ~25% extra comparator
      traffic vs a u32 payload (idx 26b | l 3b | r 3b);
  h2  the [n,4] minor-dim blocked scans pad to 128 lanes on TPU tiles
      (32x waste); a lanes-leading [8,n] layout runs at memory bandwidth.

Run: python -u tools/profile_ingest_r5.py 2>&1 | tee /tmp/ingest_r5.log
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from dbg_assembly_tpu import dna
from dbg_assembly_tpu.kmer import count as kc
from dbg_assembly_tpu.kmer import stats as _stats
from dbg_assembly_tpu.contig import graph as cg

KSIZE = 31
READ_LEN = 150
P = READ_LEN - KSIZE + 1
BATCH = 250_000
N = BATCH * P
SENTINEL = kc.SENTINEL


def timed(name, fn, *args, iters_hi=8, iters_lo=2, unit_n=N):
    t0 = time.perf_counter()
    jfn = jax.jit(fn)
    # iters is a DYNAMIC arg (bench.py pattern): one compile serves all
    # iteration counts — a static iters would fold its compile time into
    # the measurement on this remote-compile attachment
    float(np.asarray(jfn(*args, jnp.int32(1))))
    print(f"[{name}: compiled in {time.perf_counter()-t0:.1f}s]", flush=True)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, jnp.int32(iters_hi))))
        hi = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, jnp.int32(iters_lo))))
        lo = time.perf_counter() - t0
        per = (hi - lo) / (iters_hi - iters_lo)
        best = per if best is None else min(best, per)
    print(f"{name:36s} {best*1e3:9.2f} ms/iter  {unit_n/best/1e6:9.1f} M/s",
          flush=True)
    return best


def loop(body):
    def f(*args):
        args, iters = args[:-1], args[-1]

        def step(i, acc):
            rolled = tuple(jnp.roll(a, i, axis=0) for a in args)
            return acc + body(*rolled)
        return jax.lax.fori_loop(jnp.int32(0), iters, step, jnp.int64(0))
    return f


# ---- transposed blocked helpers (lanes leading: [k, n]) -------------------

def rcummin_blockedT(x, fill, block=4096):
    k, n = x.shape
    nb = -(-n // block)
    pad = nb * block - n
    xp = jnp.concatenate(
        [x, jnp.full((k, pad), fill, x.dtype)], axis=1) if pad else x
    blk = xp.reshape(k, nb, block)
    within = jax.lax.cummin(blk, axis=2, reverse=True)
    bmin = within[:, :, 0]
    nxt = jnp.concatenate([bmin[:, 1:], jnp.full((k, 1), fill, x.dtype)],
                          axis=1)
    carry = jax.lax.cummin(nxt, axis=1, reverse=True)
    out = jnp.minimum(within, carry[:, :, None])
    return out.reshape(k, nb * block)[:, :n]


def cumsum_blockedT(x, block=4096):
    k, n = x.shape
    nb = -(-n // block)
    pad = nb * block - n
    xp = jnp.concatenate(
        [x, jnp.zeros((k, pad), x.dtype)], axis=1) if pad else x
    blk = xp.reshape(k, nb, block)
    within = jnp.cumsum(blk, axis=2)
    btot = within[:, :, -1]
    carry = jnp.cumsum(btot, axis=1) - btot
    out = within + carry[:, :, None]
    return out.reshape(k, nb * block)[:, :n]


# ---- variants -------------------------------------------------------------

def v0_current(c, l_):
    uniq, lcnt, rcnt, fidx, cnts, n_uniq, n_valid = cg._aggregate_batch(
        c, l_, KSIZE, jnp.int64(0))
    return (n_uniq + n_valid + fidx[0] + cnts[0].astype(jnp.int64)
            + lcnt[0, 0].astype(jnp.int64)
            + (uniq[0] & jnp.uint64(1)).astype(jnp.int64))


def _chop(c, l_):
    return cg._chop_with_edges(c, l_, KSIZE)


def sort_only_u64(c, l_):
    can, left, right, valid = _chop(c, l_)
    sk = jnp.sort(can.reshape(-1))
    return (sk[0] & jnp.uint64(1)).astype(jnp.int64)


def sort_only_payload64(c, l_):
    can, left, right, valid = _chop(c, l_)
    flat_k = can.reshape(-1)
    flat_l = left.reshape(-1)
    flat_r = right.reshape(-1)
    n = flat_k.shape[0]
    stream_idx = jnp.arange(n, dtype=jnp.int64)
    spacked = (stream_idx | (flat_l.astype(jnp.int64) << 41)
               | (flat_r.astype(jnp.int64) << 44))
    sk, sp = jax.lax.sort((flat_k, spacked), num_keys=1, is_stable=True)
    return (sk[0] & jnp.uint64(1)).astype(jnp.int64) + sp[0]


def sort_only_payload32(c, l_):
    can, left, right, valid = _chop(c, l_)
    flat_k = can.reshape(-1)
    flat_l = left.reshape(-1).astype(jnp.uint32)
    flat_r = right.reshape(-1).astype(jnp.uint32)
    n = flat_k.shape[0]
    idx32 = jnp.arange(n, dtype=jnp.uint32)
    spacked = idx32 | (flat_l << 29) | (flat_r << 26)
    sk, sp = jax.lax.sort((flat_k, spacked), num_keys=1, is_stable=True)
    return (sk[0] & jnp.uint64(1)).astype(jnp.int64) + \
        sp[0].astype(jnp.int64)


def v1_narrow_payload(c, l_):
    """u32 payload sort + current [n,4] scan tail."""
    can, left, right, valid = _chop(c, l_)
    flat_k = can.reshape(-1)
    n = flat_k.shape[0]
    idx32 = jnp.arange(n, dtype=jnp.uint32)
    spacked = (idx32 | (left.reshape(-1).astype(jnp.uint32) << 29)
               | (right.reshape(-1).astype(jnp.uint32) << 26))
    sk, sp = jax.lax.sort((flat_k, spacked), num_keys=1, is_stable=True)
    sidx = (sp & jnp.uint32((1 << 26) - 1)).astype(jnp.int64)
    sl = ((sp >> 29) & 7).astype(jnp.int32)
    sr = ((sp >> 26) & 7).astype(jnp.int32)

    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    first = first & (sk != SENTINEL)
    n_unique = jnp.sum(first.astype(jnp.int64))
    is_valid = (sk != SENTINEL)
    n_valid = jnp.sum(is_valid.astype(jnp.int64))
    last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    last = last & is_valid

    lhot = (sl[:, None] == jnp.arange(4)[None, :]).astype(jnp.int32)
    rhot = (sr[:, None] == jnp.arange(4)[None, :]).astype(jnp.int32)
    lhot = jnp.where(is_valid[:, None], lhot, 0)
    rhot = jnp.where(is_valid[:, None], rhot, 0)
    cum_l = _stats.cumsum_blocked(lhot)
    cum_r = _stats.cumsum_blocked(rhot)
    BIGI = jnp.int32(2 ** 31 - 1)
    end_l = _stats.rcummin_blocked(
        jnp.where(last[:, None], cum_l, BIGI), BIGI)
    end_r = _stats.rcummin_blocked(
        jnp.where(last[:, None], cum_r, BIGI), BIGI)
    tot_l = end_l - (cum_l - lhot)
    tot_r = end_r - (cum_r - rhot)
    pos32 = jnp.arange(n, dtype=jnp.int32)
    end_pos = _stats.rcummin_blocked(jnp.where(last, pos32, jnp.int32(n)),
                                     jnp.int32(n))
    run_len = end_pos - pos32 + 1
    fm = first
    uniq = jnp.where(fm, sk, SENTINEL)
    first_idx = jnp.where(fm, sidx, jnp.int64(2 ** 62))
    lcnt = jnp.where(fm[:, None], jnp.clip(tot_l, 0, 255), 0)
    rcnt = jnp.where(fm[:, None], jnp.clip(tot_r, 0, 255), 0)
    counts = jnp.where(fm, run_len, 0)
    return (n_unique + n_valid + first_idx[0]
            + counts[0].astype(jnp.int64) + lcnt[0, 0].astype(jnp.int64)
            + rcnt[0, 0].astype(jnp.int64)
            + (uniq[0] & jnp.uint64(1)).astype(jnp.int64))


def v2_narrow_lanesT(c, l_):
    """u32 payload sort + lanes-leading [8,n] fused scan tail."""
    can, left, right, valid = _chop(c, l_)
    flat_k = can.reshape(-1)
    n = flat_k.shape[0]
    idx32 = jnp.arange(n, dtype=jnp.uint32)
    spacked = (idx32 | (left.reshape(-1).astype(jnp.uint32) << 29)
               | (right.reshape(-1).astype(jnp.uint32) << 26))
    sk, sp = jax.lax.sort((flat_k, spacked), num_keys=1, is_stable=True)
    sidx = (sp & jnp.uint32((1 << 26) - 1)).astype(jnp.int64)
    sl = ((sp >> 29) & 7).astype(jnp.int32)
    sr = ((sp >> 26) & 7).astype(jnp.int32)

    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    first = first & (sk != SENTINEL)
    n_unique = jnp.sum(first.astype(jnp.int64))
    is_valid = (sk != SENTINEL)
    n_valid = jnp.sum(is_valid.astype(jnp.int64))
    last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    last = last & is_valid

    lane = jnp.arange(8, dtype=jnp.int32)[:, None]
    code8 = jnp.where(lane < 4, sl[None, :], sr[None, :] + 4)
    hot = (code8 == lane).astype(jnp.int32)
    hot = jnp.where(is_valid[None, :], hot, 0)                 # [8, n]
    cum = cumsum_blockedT(hot)
    BIGI = jnp.int32(2 ** 31 - 1)
    end = rcummin_blockedT(jnp.where(last[None, :], cum, BIGI), BIGI)
    tot = end - (cum - hot)                                    # [8, n]
    pos32 = jnp.arange(n, dtype=jnp.int32)
    end_pos = _stats.rcummin_blocked(jnp.where(last, pos32, jnp.int32(n)),
                                     jnp.int32(n))
    run_len = end_pos - pos32 + 1
    fm = first
    uniq = jnp.where(fm, sk, SENTINEL)
    first_idx = jnp.where(fm, sidx, jnp.int64(2 ** 62))
    cnt8 = jnp.where(fm[None, :], jnp.clip(tot, 0, 255), 0)    # [8, n]
    counts = jnp.where(fm, run_len, 0)
    return (n_unique + n_valid + first_idx[0]
            + counts[0].astype(jnp.int64) + cnt8[0, 0].astype(jnp.int64)
            + cnt8[4, 0].astype(jnp.int64)
            + (uniq[0] & jnp.uint64(1)).astype(jnp.int64))


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(BATCH, READ_LEN), dtype=np.uint8)
    lengths = np.full(BATCH, READ_LEN, np.int32)
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)
    print(f"N = {N/1e6:.1f} M kmer slots per iter", flush=True)

    timed("v0 current _aggregate_batch", loop(v0_current), cb, lb)
    timed("sort-only (u64 key)", loop(sort_only_u64), cb, lb)
    timed("sort-only (+i64 payload)", loop(sort_only_payload64), cb, lb)
    timed("sort-only (+u32 payload)", loop(sort_only_payload32), cb, lb)
    timed("v1 narrow payload", loop(v1_narrow_payload), cb, lb)
    timed("v2 narrow + lanesT scans", loop(v2_narrow_lanesT), cb, lb)


if __name__ == "__main__":
    main()
