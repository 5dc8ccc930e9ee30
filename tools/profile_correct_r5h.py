"""Round-5 correction profiler B: optimized kernel (VERDICT r04 weak 1 / next 1).

Measures, on the real TPU at k=17 with the 2-GiB 1-bit table built ON
DEVICE (the dev tunnel moves ~3.4 MB/s; uploading the table would take
~10 min — production tables are built on device anyway):

  stageA      phase 1-3 classification alone
  full        the closed 5-phase step (bench.py's correct stage body)
  bbt1        ONE rightward BBT call, all reads active, span ~200
  bbt1_opt    same call through the optimized kernel (lax.top_k lane
              compaction + packed change-slots instead of the 64-lane
              stable argsort + [N,W,2] minor-2 arrays)

Run: python -u tools/profile_correct_r5h.py 2>&1 | tee /tmp/correct_r5.log
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
from dbg_assembly_tpu.correct import device as dev
from dbg_assembly_tpu.correct.engine import CorrectParams

K = 17
N_READS = 8192
L = 250


def build_bitmap_device(codes, lengths, k):
    """1-bit high-freq table (count > 1, RC bits set) as little-endian u32
    words, built on device: count_unique_fast + bit scatter-add (distinct
    bit indices sum to OR; odd k has no RC fixed points)."""
    from dbg_assembly_tpu.kmer import count as kc

    @jax.jit
    def build(c, l_):
        uniq_m, counts_m, n_unique, _ = kc.count_unique_fast(c, l_, k)
        hi = jnp.where(counts_m > 1, uniq_m, kc.SENTINEL)
        rc = dna.revcomp_kbit(hi, k)
        bits = jnp.concatenate([hi, rc])
        ok = bits != kc.SENTINEL
        word = (bits >> jnp.uint64(5)).astype(jnp.int32)
        word = jnp.where(ok, word, 1 << 30)
        shift = (jnp.uint64(8) * ((bits >> jnp.uint64(3)) & jnp.uint64(3))
                 + (jnp.uint64(7) - (bits & jnp.uint64(7))))
        val = (jnp.uint32(1) << shift.astype(jnp.uint32))
        table = jnp.zeros((1 << (2 * k - 5),), jnp.uint32)
        return table.at[word].add(jnp.where(ok, val, 0), mode="drop")

    return build(jnp.asarray(codes), jnp.asarray(lengths))


def timed(name, fn, *args, iters_hi=6, iters_lo=1, unit_n=N_READS,
          repeats=3):
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
    spread = " ".join(f"{s*1e3:.0f}" for s in secs)
    print(f"{name:20s} {best*1e3:9.1f} ms/iter  {unit_n/best:9.0f} "
          f"reads/s   [{spread}]", flush=True)
    return best


def loop(body):
    def f(*args):
        args, iters = args[:-1], args[-1]

        def step(i, acc):
            return acc + body(*args)
        return jax.lax.fori_loop(jnp.int32(0), iters, step, jnp.int64(0))
    return f


def main():
    dev.BEAM_W = 8   # half the beam: halves the per-lane table gathers;
                     # overflow falls back to the host engine (exact)
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from bench_stages import make_pe250

    print("generating reads...", flush=True)
    ascii_np, codes, lengths, _ = make_pe250(N_READS)
    p = CorrectParams(ksize=K, max_change=2).resolved()
    m, mc = p.high_freq_reg_len, p.max_change

    dvc = jax.devices()[0]
    print("device:", dvc, getattr(dvc, "memory_stats", lambda: {})(),
          flush=True)
    t0 = time.perf_counter()
    bmd = jax.block_until_ready(
        build_bitmap_device(codes, lengths, K))
    print(f"device bitmap built in {time.perf_counter()-t0:.1f}s "
          f"({bmd.nbytes/2**30:.2f} GiB)", flush=True)

    ab = jnp.asarray(ascii_np)
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)

    # wave count + active fractions (one stage-A run)
    a2, one, hs1, he1, num_h, fb = dev._stage_a(ab, cb, lb, bmd, k=K,
                                                m=m, max_change=mc)
    num_h = np.asarray(num_h)
    waves = max(int(num_h.max()) - 1, 0)
    print(f"waves={waves}  active/wave:",
          [int((num_h >= i + 2).sum()) for i in range(waves)],
          " fallbackA:", int(np.asarray(fb).sum()), flush=True)

    def body_stage_a(bm, a, c, l_):
        a2, one, hs1, he1, num_h, fb = dev._stage_a(a, c, l_, bm, k=K,
                                                    m=m, max_change=mc)
        return (jnp.sum(one + num_h).astype(jnp.int64)
                + a2[0, 0].astype(jnp.int64) + hs1[0, 0] + he1[0, 0])

    def body_full(bm, a, c, l_):
        a2, one, hs1, he1, num_h, fb = dev._stage_a(a, c, l_, bm, k=K,
                                                    m=m, max_change=mc)
        accum = one
        multi = jnp.zeros_like(one)
        fail = jnp.zeros(hs1.shape, bool)

        def wave(i, st):
            a2, accum, multi, fail, fb = st
            return dev._wave_step(a2, l_, bm, hs1, he1, num_h, accum,
                                  multi, fail, fb, i.astype(jnp.int32),
                                  jnp.int32(mc), k=K,
                                  compact_c=N_READS // 4)
        a2, accum, multi, fail, fb = jax.lax.fori_loop(
            0, waves, wave, (a2, accum, multi, fail, fb))
        a2, multi, deleted, tl, tr, fb = dev._phase5(
            a2, l_, bm, hs1, he1, num_h, accum, multi, fail, fb,
            k=K, mc=mc, ft=p.further_trim, min_len=p.min_read_len,
            compact_c=N_READS // 2)
        return (jnp.sum(one + multi + deleted + tl + tr).astype(jnp.int64)
                + jnp.sum(fb).astype(jnp.int64)
                + a2[0, 0].astype(jnp.int64))

    N = N_READS
    act = jnp.ones((N,), bool)
    cs = jnp.full((N,), 40, jnp.int32)       # span 40..239 (~200 trips)
    ce = jnp.full((N,), 239, jnp.int32)
    ma = jnp.full((N,), 2, jnp.int32)
    lc = jnp.full((N,), 0, jnp.int32)

    def body_bbt1(bm, a, l_):
        a2, num, lnt, lch, ovf = dev._bbt_batch(
            a, l_, bm, act, cs, ce, ma, lc, k=K, rightward=True,
            is_modify_trimmed=False)
        return (jnp.sum(num + lnt).astype(jnp.int64)
                + a2[0, 0].astype(jnp.int64))

    # fallback count at W=8 (one un-timed run)
    import jax as _jax

    def body_fb(bm, a, c, l_):
        return body_full(bm, a, c, l_)
    a2, one, hs1, he1, num_h2, fb = dev._stage_a(ab, cb, lb, bmd, k=K,
                                                 m=m, max_change=mc)
    timed("full W=8", loop(body_full), bmd, ab, cb, lb)


if __name__ == "__main__":
    main()
