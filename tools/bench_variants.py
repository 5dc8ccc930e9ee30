"""Whole-pipeline counting-variant shootout on the real device.

Times each counting pipeline END-TO-END with the only methodology that is
trustworthy on this host<->TPU tunnel (CLAUDE.md): the entire timing loop
runs inside ONE jitted lax.fori_loop, a scalar is materialized to sync, and
two iteration counts are differenced to cancel per-call dispatch latency.

Variants:
  mono    — chop_canonical + monolithic jnp.sort + count_stats
            (the bench.py path as of round 2: 79.2M kmers/s = 23.16x)
  bucket  — kmer/bucket.py count_spectrum (VMEM-tiled bucketed sort)

Results are printed as one JSON line per variant and appended to
PROFILE.md by hand (VERDICT round-2 weak 9: record what the probes learn).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, 'tools', 'bucket_lab'))

import jax
import jax.numpy as jnp

KSIZE = 31
READ_LEN = 150


def make_input(batch):
    rng = np.random.default_rng(7)
    # genome-derived reads so species counts are realistic (repeat skew)
    genome = rng.integers(0, 4, size=3_000_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - READ_LEN, size=batch)
    codes = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
    lengths = np.full(batch, READ_LEN, np.int32)
    return codes, lengths


def run_loop(step, cb, lb, iters_hi=12, iters_lo=2, rounds=2):
    """step(codes, lengths) -> int64 scalar; time via fori_loop differencing."""

    @jax.jit
    def loop(c, l_, iters):
        def body(i, acc):
            c2 = jnp.roll(c, i, axis=0)
            return acc + step(c2, l_)
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))

    t0 = time.perf_counter()
    float(np.asarray(loop(cb, lb, 1)))     # compile + warm
    compile_s = time.perf_counter() - t0
    per_iters = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(np.asarray(loop(cb, lb, iters_hi)))
        d_hi = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(loop(cb, lb, iters_lo)))
        d_lo = time.perf_counter() - t0
        per_iters.append(max((d_hi - d_lo) / (iters_hi - iters_lo), 1e-9))
    return compile_s, per_iters


def variant_mono(batch):
    from dbg_assembly_tpu.kmer import count as kc

    def step(c, l_):
        flat, n_valid = kc.chop_canonical(c, l_, KSIZE)
        flat = jnp.sort(flat)
        spectrum, n_unique, _ = kc.count_stats(flat, max_freq=255)
        return spectrum[1] + n_unique + n_valid
    return step


def variant_bucket(batch, B, S):
    import bucket

    def step(c, l_):
        spectrum, n_unique, n_valid, overflow = bucket.count_spectrum(
            c, l_, ksize=KSIZE, B=B, S=S)
        return spectrum[1] + n_unique + n_valid + overflow.astype(jnp.int64)
    return step


def variant_bucket2(batch, B, S):
    import bucket2

    def step(c, l_):
        spectrum, n_unique, n_valid, overflow = bucket2.count_spectrum(
            c, l_, ksize=KSIZE, B=B, S=S)
        return spectrum[1] + n_unique + n_valid + overflow.astype(jnp.int64)
    return step


def variant_chop(batch):
    """Chop + canonical + hash only (lower bound shared by all variants)."""
    import bucket

    def step(c, l_):
        flat, n_valid = bucket._chop_hash(c, l_, KSIZE)
        return n_valid + flat[0].astype(jnp.int64)
    return step


def variant_chopsort(batch):
    """Chop + the monolithic u64 sort, no stats (isolates the sort cost)."""
    from dbg_assembly_tpu.kmer import count as kc

    def step(c, l_):
        flat, n_valid = kc.chop_canonical(c, l_, KSIZE)
        flat = jnp.sort(flat)
        mid = flat.shape[0] // 2
        return n_valid + flat[mid].astype(jnp.int64) + flat[-1].astype(jnp.int64)
    return step


def variant_rowsort(batch, S):
    """Chop + row-sort in [T, S] tiles: is XLA's sort stage-proportional?"""
    import bucket

    def step(c, l_):
        flat, n_valid = bucket._chop_hash(c, l_, KSIZE)
        n = flat.shape[0]
        T = -(-n // S)
        pad = T * S - n
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.full((pad,), bucket.SENTINEL, jnp.uint64)])
        tiles = jnp.sort(flat.reshape(T, S), axis=1)
        return n_valid + tiles[0, 0].astype(jnp.int64) \
            + tiles[-1, -1].astype(jnp.int64) \
            + tiles[T // 2, S // 2].astype(jnp.int64)
    return step


def variant_mono2(batch):
    """Chop + monolithic u64 sort + LEAN stats: gather-free run-length via
    cummin + MXU one-hot int8 matmul histogram (no second 30M sort)."""
    from dbg_assembly_tpu.kmer import count as kc
    from dbg_assembly_tpu.kmer import stats as ks

    def step(c, l_):
        flat, n_valid = kc.chop_canonical(c, l_, KSIZE)
        flat = jnp.sort(flat)
        spectrum, n_unique = ks.spectrum_sorted(flat, max_freq=255)
        return spectrum[1] + n_unique + n_valid
    return step


def variant_fast(batch):
    """The production fast path: chop + single sort + blocked-window stats."""
    from dbg_assembly_tpu.kmer import count as kc

    def step(c, l_):
        spectrum, n_unique, n_valid = kc.count_spectrum_fast(c, l_, KSIZE)
        return spectrum[1] + n_unique + n_valid
    return step


def variant_fastp(batch):
    """Pallas fused chop + pair sort + pair stats."""
    from dbg_assembly_tpu.kmer import count as kc

    def step(c, l_):
        spectrum, n_unique, n_valid = kc.count_spectrum_fast_pallas(
            c, l_, KSIZE)
        return spectrum[1] + n_unique + n_valid
    return step


def variant_sortpair32(batch):
    """Chop + lax.sort of the u64 keys split into (hi, lo) u32 operands:
    does comparator key width drive the monolithic sort cost?"""
    def step(c, l_):
        import bucket
        flat, n_valid = bucket._chop_hash(c, l_, KSIZE)
        hi = (flat >> jnp.uint64(32)).astype(jnp.uint32)
        lo = flat.astype(jnp.uint32)
        hi, lo = jax.lax.sort((hi, lo), num_keys=2)
        mid = hi.shape[0] // 2
        return n_valid + hi[mid].astype(jnp.int64) + lo[-1].astype(jnp.int64)
    return step


def variant_cummin(batch):
    """Chop + one reverse cummin pass (isolates scan cost; no sort)."""
    def step(c, l_):
        import bucket
        flat, n_valid = bucket._chop_hash(c, l_, KSIZE)
        m = jnp.flip(jax.lax.cummin(jnp.flip(
            flat.astype(jnp.int64))))
        return n_valid + m[0]
    return step


def variant_hist(batch):
    """Chop + int8 one-hot matmul histogram of the low byte (isolates the
    MXU histogram cost; no sort)."""
    from dbg_assembly_tpu.kmer import stats as ks

    def step(c, l_):
        import bucket
        flat, n_valid = bucket._chop_hash(c, l_, KSIZE)
        v = (flat & jnp.uint64(255)).astype(jnp.int32)
        spec = ks.histogram256(v)
        return n_valid + spec[3]
    return step


def variant_ingest(batch):
    """Full graph-ingest step: chop + strand-adjusted neighbor extraction
    + sort + edge-counter segment-reduce + first-occurrence index
    (contig/graph.py:_aggregate_batch) — the BASELINE.md north-star op
    racing the reference ingest hot loop (DBGgraph.cpp:64-98,167-205),
    i.e. counting PLUS the 2x4 packed edge counters."""
    from dbg_assembly_tpu.contig import graph as g

    def step(c, l_):
        (uniq, lcnt, rcnt, fidx, counts, n_unique,
         n_valid) = g._aggregate_batch(c, l_, KSIZE, jnp.int64(0))
        return (n_valid + n_unique + fidx[0]
                + lcnt[0, 0].astype(jnp.int64)
                + rcnt[0, 0].astype(jnp.int64)
                + counts[0].astype(jnp.int64))
    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=250_000)
    ap.add_argument("--variants", default="mono,bucket")
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--S", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    codes, lengths = make_input(args.batch)
    P = READ_LEN - KSIZE + 1
    n = args.batch * P
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)
    jax.block_until_ready(cb)
    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"n_kmers={n}", flush=True)

    for name in args.variants.split(","):
        if name == "mono":
            step = variant_mono(args.batch)
        elif name == "bucket":
            step = variant_bucket(args.batch, args.B, args.S)
        elif name == "bucket2":
            step = variant_bucket2(args.batch, args.B, args.S)
        elif name == "chop":
            step = variant_chop(args.batch)
        elif name == "chopsort":
            step = variant_chopsort(args.batch)
        elif name.startswith("rowsort"):
            step = variant_rowsort(args.batch, int(name[len("rowsort"):]))
        elif name == "mono2":
            step = variant_mono2(args.batch)
        elif name == "sortpair32":
            step = variant_sortpair32(args.batch)
        elif name == "fast":
            step = variant_fast(args.batch)
        elif name == "fastp":
            step = variant_fastp(args.batch)
        elif name == "cummin":
            step = variant_cummin(args.batch)
        elif name == "hist":
            step = variant_hist(args.batch)
        elif name == "ingest":
            step = variant_ingest(args.batch)
        else:
            raise SystemExit(f"unknown variant {name}")
        compile_s, per_iters = run_loop(step, cb, lb, iters_hi=args.iters)
        best = min(per_iters)
        print(json.dumps({
            "variant": name, "B": args.B, "S": args.S,
            "compile_s": round(compile_s, 2),
            "per_iter_s": [round(x, 5) for x in per_iters],
            "kmers_per_s": round(n / best, 0),
        }), flush=True)


if __name__ == "__main__":
    main()
