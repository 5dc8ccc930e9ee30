"""Round-5 ingest profiler, part B: repeat-stability + tail isolation.

Part A (profile_ingest_r5.py, /tmp/ingest_r5.log) measured:
  v0 current 243.4 | sort u64 135.1 | +i64 payload 195.6 | +u32 163.8
  v1 u32+[n,4] scans 253.9 (?!) | v2 u32+lanesT 239.8
The sort-only numbers say u32 payload should win ~32 ms, yet both full
variants lost to v0.  This part re-measures v0/v1 with more repeats and
isolates the tail: v4 = payload sort + run_len only (no edge counters),
v6 = [n,8] fused one-hot (single cumsum/rcummin call pair), v7 = v0 tail
with block=16384.

Run: python -u tools/profile_ingest_r5b.py 2>&1 | tee /tmp/ingest_r5b.log
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from dbg_assembly_tpu.kmer import count as kc
from dbg_assembly_tpu.kmer import stats as _stats
from dbg_assembly_tpu.contig import graph as cg

KSIZE = 31
READ_LEN = 150
P = READ_LEN - KSIZE + 1
BATCH = 250_000
N = BATCH * P
SENTINEL = kc.SENTINEL


def timed(name, fn, *args, iters_hi=10, iters_lo=2, unit_n=N, repeats=3):
    t0 = time.perf_counter()
    jfn = jax.jit(fn)
    float(np.asarray(jfn(*args, jnp.int32(1))))
    print(f"[{name}: compiled in {time.perf_counter()-t0:.1f}s]", flush=True)
    secs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, jnp.int32(iters_hi))))
        hi = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args, jnp.int32(iters_lo))))
        lo = time.perf_counter() - t0
        secs.append((hi - lo) / (iters_hi - iters_lo))
    best = min(secs)
    spread = " ".join(f"{s*1e3:.1f}" for s in secs)
    print(f"{name:34s} {best*1e3:9.2f} ms/iter  {unit_n/best/1e6:8.1f} M/s"
          f"   [{spread}]", flush=True)
    return best


def loop(body):
    def f(*args):
        args, iters = args[:-1], args[-1]

        def step(i, acc):
            rolled = tuple(jnp.roll(a, i, axis=0) for a in args)
            return acc + body(*rolled)
        return jax.lax.fori_loop(jnp.int32(0), iters, step, jnp.int64(0))
    return f


def _sorted_payload(c, l_):
    can, left, right, valid = cg._chop_with_edges(c, l_, KSIZE)
    flat_k = can.reshape(-1)
    n = flat_k.shape[0]
    stream_idx = jnp.arange(n, dtype=jnp.int64)
    spacked = (stream_idx
               | (left.reshape(-1).astype(jnp.int64) << 41)
               | (right.reshape(-1).astype(jnp.int64) << 44))
    sk, sp = jax.lax.sort((flat_k, spacked), num_keys=1, is_stable=True)
    return sk, sp


def v0_current(c, l_):
    uniq, lcnt, rcnt, fidx, cnts, n_uniq, n_valid = cg._aggregate_batch(
        c, l_, KSIZE, jnp.int64(0))
    return (n_uniq + n_valid + fidx[0] + cnts[0].astype(jnp.int64)
            + lcnt[0, 0].astype(jnp.int64)
            + (uniq[0] & jnp.uint64(1)).astype(jnp.int64))


def v4_no_counters(c, l_):
    """payload sort + boundaries + run_len + first_idx; NO edge counters."""
    sk, sp = _sorted_payload(c, l_)
    n = sk.shape[0]
    sidx = sp & jnp.int64((1 << 41) - 1)
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    first = first & (sk != SENTINEL)
    is_valid = (sk != SENTINEL)
    last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    last = last & is_valid
    pos32 = jnp.arange(n, dtype=jnp.int32)
    end_pos = _stats.rcummin_blocked(jnp.where(last, pos32, jnp.int32(n)),
                                     jnp.int32(n))
    run_len = end_pos - pos32 + 1
    uniq = jnp.where(first, sk, SENTINEL)
    first_idx = jnp.where(first, sidx, jnp.int64(2 ** 62))
    counts = jnp.where(first, run_len, 0)
    return (jnp.sum(first.astype(jnp.int64)) + first_idx[0]
            + counts[0].astype(jnp.int64)
            + (uniq[0] & jnp.uint64(1)).astype(jnp.int64))


def _tail_8(sk, sp, block):
    n = sk.shape[0]
    sidx = sp & jnp.int64((1 << 41) - 1)
    sl = ((sp >> 41) & 7).astype(jnp.int32)
    sr = ((sp >> 44) & 7).astype(jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    first = first & (sk != SENTINEL)
    is_valid = (sk != SENTINEL)
    last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    last = last & is_valid
    hot = jnp.concatenate(
        [(sl[:, None] == jnp.arange(4)[None, :]),
         (sr[:, None] == jnp.arange(4)[None, :])], axis=1).astype(jnp.int32)
    hot = jnp.where(is_valid[:, None], hot, 0)                  # [n, 8]
    cum = _stats.cumsum_blocked(hot, block=block)
    BIGI = jnp.int32(2 ** 31 - 1)
    end = _stats.rcummin_blocked(
        jnp.where(last[:, None], cum, BIGI), BIGI, block=block)
    tot = end - (cum - hot)
    pos32 = jnp.arange(n, dtype=jnp.int32)
    end_pos = _stats.rcummin_blocked(jnp.where(last, pos32, jnp.int32(n)),
                                     jnp.int32(n), block=block)
    run_len = end_pos - pos32 + 1
    uniq = jnp.where(first, sk, SENTINEL)
    first_idx = jnp.where(first, sidx, jnp.int64(2 ** 62))
    cnt8 = jnp.where(first[:, None], jnp.clip(tot, 0, 255), 0)
    counts = jnp.where(first, run_len, 0)
    return (jnp.sum(first.astype(jnp.int64)) + first_idx[0]
            + counts[0].astype(jnp.int64) + cnt8[0, 0].astype(jnp.int64)
            + cnt8[0, 4].astype(jnp.int64)
            + (uniq[0] & jnp.uint64(1)).astype(jnp.int64))


def v6_hot8(c, l_):
    sk, sp = _sorted_payload(c, l_)
    return _tail_8(sk, sp, 4096)


def v7_hot8_big_block(c, l_):
    sk, sp = _sorted_payload(c, l_)
    return _tail_8(sk, sp, 16384)


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(BATCH, READ_LEN), dtype=np.uint8)
    lengths = np.full(BATCH, READ_LEN, np.int32)
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)
    print(f"N = {N/1e6:.1f} M kmer slots per iter", flush=True)
    timed("v0 current", loop(v0_current), cb, lb)
    timed("v4 payload sort + run_len only", loop(v4_no_counters), cb, lb)
    timed("v6 [n,8] fused one-hot", loop(v6_hot8), cb, lb)
    timed("v7 [n,8] block=16384", loop(v7_hot8_big_block), cb, lb)
    timed("v0 current (again)", loop(v0_current), cb, lb)


if __name__ == "__main__":
    main()
