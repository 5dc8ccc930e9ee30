"""Benchmark: canonical k-mer counting throughput per chip (k=31).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "stages"}.

The headline times the PRODUCTION counting kernel — kmer.count.
count_unique_fast, the (unique, counts)-producing step that KmerCounter /
kmerfreq run per batch (chop + one device sort + gather-free run-length
encode).  Round 3's bench timed a spectrum-only kernel no production path
called (VERDICT r03 weak 1); that pipeline is now reported as the
"spectrum" stage alongside.

"stages" adds device-resident end-to-end rates (VERDICT r03 item 5,
BASELINE.json "end-to-end reads/s to contigs"):
  spectrum    count_spectrum_fast (chop+sort+blocked-window-min stats)
  ingest      contig.graph._aggregate_batch — reads -> NodeTable rows
              (k-mers + 2x4 edge counters + first-occurrence index)
  correct     the closed 5-phase correction step (stage A + BBT waves +
              phase 5) at k=13 on PE250 reads, reads/s

Baseline = the reference's single-core C++ graph-ingest rate (k-mers/s),
measured once on this host by running the shipped debruijn_contig with -t 1
and parsing its log (kmers loaded / CPU-s at end of ingest), cached in
bench_baseline.json.  BASELINE.md's published figure is ~2.9M k-mers/CPU-s
on 10 threads; the single-core rate is the agreed denominator
(BASELINE.json: ">=50x the single-core C++ k-mer-counting throughput").
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BASELINE_FILE = os.path.join(ROOT, "bench_baseline.json")
DATA_DIR = os.path.join(ROOT, "tests", "_golden_cache", "bench")
KSIZE = 31
READ_LEN = 150
N_READS_REF = 150_000         # subset for the single-core baseline run
BATCH = 250_000               # device batch: 37.5M k-mer slots

KSIZE_CORRECT = 13            # correction-stage table fits the dev tunnel
N_READS_CORRECT = 8192


def ensure_data():
    os.makedirs(DATA_DIR, exist_ok=True)
    marker = os.path.join(DATA_DIR, "DONE")
    if not os.path.exists(marker):
        from tools.simulate_reads import make_genome, simulate_pe, write_fq_gz
        genome = make_genome(3_000_000, seed=42)
        r1, q1, r2, q2 = simulate_pe(genome, READ_LEN, 400, 50.0, seed=43)
        write_fq_gz(os.path.join(DATA_DIR, "bench_1.fq.gz"), "bench",
                    r1, q1, 1)
        write_fq_gz(os.path.join(DATA_DIR, "bench_2.fq.gz"), "bench",
                    r2, q2, 2)
        np.save(os.path.join(DATA_DIR, "codes.npy"),
                np.concatenate([np.searchsorted(
                    np.frombuffer(b"ACGT", np.uint8), r1),
                    np.searchsorted(np.frombuffer(b"ACGT", np.uint8), r2)])
                .astype(np.uint8))
        open(marker, "w").close()
    return DATA_DIR


def measure_baseline() -> float:
    """Single-core reference ingest rate (k-mers/s)."""
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["ref_single_core_kmers_per_s"]
    ensure_data()
    lib = os.path.join(DATA_DIR, "ref.lib")
    fq = os.path.join(DATA_DIR, "bench_1.fq.gz")
    # subset the fastq to N_READS_REF reads
    import gzip
    sub = os.path.join(DATA_DIR, "ref_subset.fq.gz")
    if not os.path.exists(sub):
        with gzip.open(fq, "rb") as f:
            lines = []
            for i, line in enumerate(f):
                if i >= 4 * N_READS_REF:
                    break
                lines.append(line)
        with gzip.open(sub, "wb") as f:
            f.writelines(lines)
    with open(lib, "w") as f:
        f.write(sub + "\n")
    log = os.path.join(DATA_DIR, "ref_bench.log")
    with open(log, "wb") as lf:
        subprocess.run(
            ["/root/reference/DBG_contig/debruijn_contig", "-f", "1",
             "-k", str(KSIZE), "-r", "250", "-t", "1", "-i", "0.01",
             "-M", "125", "-o", os.path.join(DATA_DIR, "refbench"), lib],
            stderr=lf, stdout=subprocess.DEVNULL, timeout=3000, check=True)
    text = open(log).read()
    kmers = int(re.search(r"Total number of kmers loaded into memory: (\d+)",
                          text).group(1))
    # Run time lines: [0] after hash init, [1] after ingest of file 1
    times = [float(x) for x in re.findall(r"Run time: ([0-9.]+)", text)]
    ingest_s = times[1] - times[0]
    rate = kmers / ingest_s
    with open(BASELINE_FILE, "w") as f:
        json.dump({"ref_single_core_kmers_per_s": rate,
                   "kmers": kmers, "ingest_s": ingest_s}, f, indent=1)
    return rate


def _time_loop(body, args, iters_hi=12, iters_lo=2, repeats=3):
    """CLAUDE.md methodology: the whole timing loop inside ONE jitted
    lax.fori_loop (per-call dispatch through the dev tunnel costs seconds),
    two iteration counts differenced to cancel dispatch latency, scalar
    materialized to sync.  Returns best per-iteration seconds and the
    per-repeat spread."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args, n):
        def step(i, acc):
            rolled = tuple(jnp.roll(a, i, axis=0) for a in args)
            return acc + body(*rolled)
        return jax.lax.fori_loop(0, n, step, jnp.int64(0))

    float(np.asarray(loop(args, 1)))          # compile + warm
    secs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(loop(args, iters_hi)))
        d_hi = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(loop(args, iters_lo)))
        d_lo = time.perf_counter() - t0
        secs.append(max((d_hi - d_lo) / (iters_hi - iters_lo), 1e-9))
    return min(secs), secs


def measure_counting():
    """Production (unique, counts) kernel + spectrum + ingest stages.

    Input is preloaded into HBM (the dev-environment host<->device tunnel
    moves ~3.4 MB/s and would otherwise dominate; production input
    pipelines feed devices at PCIe/ICI rates)."""
    import jax.numpy as jnp
    from dbg_assembly_tpu.kmer import count as kc
    from dbg_assembly_tpu.contig import graph as cg

    ensure_data()
    codes = np.load(os.path.join(DATA_DIR, "codes.npy"))[:BATCH]
    lengths = np.full(len(codes), READ_LEN, np.int32)
    P = READ_LEN - KSIZE + 1
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)
    nk = BATCH * P

    def body_prod(c, l_):
        uniq_m, counts_m, n_unique, n_valid = kc.count_unique_fast(
            c, l_, KSIZE)
        return (n_unique + n_valid + counts_m[12345].astype(jnp.int64)
                + (uniq_m[123] & jnp.uint64(1)).astype(jnp.int64))

    def body_spectrum(c, l_):
        spectrum, n_unique, n_valid = kc.count_spectrum_fast(
            c, l_, KSIZE, max_freq=255)
        return spectrum[1] + n_unique + n_valid

    def body_ingest(c, l_):
        uniq, lcnt, rcnt, fidx, cnts, n_uniq, n_valid = cg._aggregate_batch(
            c, l_, KSIZE, jnp.int64(0))
        return (n_uniq + n_valid + fidx[0] + cnts[0].astype(jnp.int64)
                + lcnt[0, 0].astype(jnp.int64)
                + (uniq[0] & jnp.uint64(1)).astype(jnp.int64))

    per_prod, spread = _time_loop(body_prod, (cb, lb))
    per_spec, _ = _time_loop(body_spectrum, (cb, lb), repeats=2)
    per_ing, _ = _time_loop(body_ingest, (cb, lb), repeats=2)
    return {
        "prod_kmers_per_s": nk / per_prod,
        "prod_spread_ms": [round(s * 1e3, 1) for s in spread],
        "spectrum_kmers_per_s": nk / per_spec,
        "ingest_kmers_per_s": nk / per_ing,
    }


def measure_correction():
    """Device-resident 5-phase correction step (reads -> corrected),
    k=13 table (the k=17 2-GiB table exceeds the dev tunnel's practical
    upload budget; the kernel is k-independent modulo table size)."""
    import jax
    import jax.numpy as jnp
    from tools.bench_stages import make_pe250, build_bitmap
    from dbg_assembly_tpu.correct import device as dev
    from dbg_assembly_tpu.correct.engine import CorrectParams

    n = N_READS_CORRECT
    ascii_np, codes, lengths, _ = make_pe250(n)
    bitmap = build_bitmap(codes, lengths, KSIZE_CORRECT)
    p = CorrectParams(ksize=KSIZE_CORRECT, max_change=2).resolved()
    k, m, mc = p.ksize, p.high_freq_reg_len, p.max_change
    bmd = jax.block_until_ready(dev.bitmap_device(bitmap))
    ab = jnp.asarray(ascii_np)
    cb = jnp.asarray(codes)
    lb = jnp.asarray(lengths)
    _, _, _, _, num_h, _ = dev._stage_a(ab, cb, lb, bmd, k=k, m=m,
                                        max_change=mc)
    waves = max(int(jnp.max(num_h)) - 1, 0)

    def body(a, c, l_):
        a2, one, hs1, he1, num_h, fb = dev._stage_a(a, c, l_, bmd, k=k,
                                                    m=m, max_change=mc)
        accum = one
        multi = jnp.zeros_like(one)
        fail = jnp.zeros(hs1.shape, bool)

        def wave(i, st):
            a2, accum, multi, fail, fb = st
            return dev._wave_step(
                a2, l_, bmd, hs1, he1, num_h, accum, multi, fail, fb,
                i.astype(jnp.int32), jnp.int32(mc), k=k)

        a2, accum, multi, fail, fb = jax.lax.fori_loop(
            0, waves, wave, (a2, accum, multi, fail, fb))
        a2, multi, deleted, tl, tr, fb = dev._phase5(
            a2, l_, bmd, hs1, he1, num_h, accum, multi, fail, fb,
            k=k, mc=mc, ft=p.further_trim, min_len=p.min_read_len)
        return (jnp.sum(one + multi + deleted + tl + tr).astype(jnp.int64)
                + jnp.sum(fb).astype(jnp.int64)
                + a2[0, 0].astype(jnp.int64))

    per_iter, _ = _time_loop(body, (ab, cb, lb), iters_hi=8, repeats=2)
    return {"correct_reads_per_s": n / per_iter, "waves": waves}


def main():
    baseline = measure_baseline()
    counting = measure_counting()
    try:
        corr = measure_correction()
    except Exception as e:                      # stage metric must never
        corr = {"correct_reads_per_s": 0.0,     # kill the headline
                "error": f"{type(e).__name__}: {e}"[:200]}
    rate = counting["prod_kmers_per_s"]
    stages = {
        "spectrum_kmers_per_s": round(counting["spectrum_kmers_per_s"], 1),
        "spectrum_vs_baseline": round(
            counting["spectrum_kmers_per_s"] / baseline, 3),
        "ingest_kmers_per_s": round(counting["ingest_kmers_per_s"], 1),
        "ingest_vs_baseline": round(
            counting["ingest_kmers_per_s"] / baseline, 3),
        "correct_reads_per_s": round(corr["correct_reads_per_s"], 1),
        "headline_spread_ms_per_iter": counting["prod_spread_ms"],
    }
    for key in ("waves", "error"):
        if key in corr:
            stages["correct_" + key] = corr[key]
    print(json.dumps({
        "metric": "kmers_counted_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(rate / baseline, 3),
        "stages": stages,
    }))


if __name__ == "__main__":
    main()
