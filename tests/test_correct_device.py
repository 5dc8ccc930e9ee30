"""Device correction engine (correct/device.py) vs the parity host engine.

Random genomes + error-planted reads; the device wave/beam pipeline must
reproduce the host ReadCorrector's scores, trims, deletions and the
corrected read bytes exactly (fallback rows excluded — they are re-run on
the host engine by the pipeline anyway)."""

import numpy as np
import pytest

from dbg_assembly_tpu import dna
from dbg_assembly_tpu.kmer import count as kc
from dbg_assembly_tpu.correct.engine import (CorrectParams, ReadCorrector,
                                             classify_regions_batch)
from dbg_assembly_tpu.correct import device as dev


def _make_case(seed, n_reads=120, read_len=80, k=13, genome_len=4000,
               n_err_max=4):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_len).astype(np.uint8)
    # bitmap: genome k-mers (canonical) are "high frequency"
    gk = dna.rolling_kmers(genome, k)
    can = np.minimum(gk, dna.revcomp_kbit(gk, k))
    counts = np.full(len(can), 9, np.int64)
    bitmap = kc.freq_bitmap(can, counts, k, low_freq_cutoff=1)
    bitmap = kc.expand_bitmap_rc(bitmap, k)

    starts = rng.integers(0, genome_len - read_len, n_reads)
    codes = np.stack([genome[s:s + read_len] for s in starts])
    for i in range(n_reads):
        for _ in range(rng.integers(0, n_err_max + 1)):
            p = rng.integers(0, read_len)
            codes[i, p] = rng.integers(0, 4)
    ascii_seq = np.frombuffer(b"ACGT", np.uint8)[codes].copy()
    lengths = np.full(n_reads, read_len, np.int32)
    return ascii_seq, codes, lengths, bitmap


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_device_matches_host(seed):
    ascii_seq, codes, lengths, bitmap = _make_case(seed)
    p = CorrectParams(ksize=13, max_change=2, min_read_len=40).resolved()

    import jax.numpy as jnp
    (one, multi, deleted, tl, tr, am, fb) = dev.correct_batch_device(
        ascii_seq.copy(), codes, lengths, jnp.asarray(bitmap), p)

    bits = classify_regions_batch(codes, lengths, bitmap, p.ksize)
    n = len(lengths)
    host = []
    reads_host = ascii_seq.copy()
    for i in range(n):
        corr = ReadCorrector(bitmap, p)
        L = int(lengths[i])
        read = bytearray(ascii_seq[i, :L].tobytes())
        res = corr.correct_one_read(read, bits[i, :L - p.ksize + 1])
        host.append(res)
        reads_host[i, :L] = np.frombuffer(bytes(read), np.uint8)
    ho, hm, hd, htl, htr = map(np.array, zip(*host))

    keep = ~fb
    assert keep.sum() > 0
    np.testing.assert_array_equal(one[keep], ho[keep], err_msg="one_score")
    np.testing.assert_array_equal(multi[keep], hm[keep],
                                  err_msg="multi_score")
    np.testing.assert_array_equal(deleted[keep], hd[keep],
                                  err_msg="deleted")
    np.testing.assert_array_equal(tl[keep], htl[keep], err_msg="trim_left")
    np.testing.assert_array_equal(tr[keep], htr[keep], err_msg="trim_right")
    np.testing.assert_array_equal(am[keep], reads_host[keep],
                                  err_msg="read bytes")
    # the point of the device path: fallback should be rare
    assert fb.mean() < 0.1


def test_pipeline_jax_engine_matches_native(tmp_path):
    """Full correct_file through engine='jax' vs engine='native'."""
    import gzip
    from dbg_assembly_tpu.correct import pipeline

    ascii_seq, codes, lengths, bitmap = _make_case(7, n_reads=60)
    fq = str(tmp_path / "reads.fq.gz")
    with gzip.open(fq, "wb") as f:
        for i in range(len(lengths)):
            seq = ascii_seq[i].tobytes()
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
    p = CorrectParams(ksize=13, max_change=2, min_read_len=40)

    pipeline.correct_file(fq, bitmap, p, fmt=1, engine="native")
    ref_out = gzip.open(fq + ".correct.fa.gz").read()
    ref_stat = open(fq + ".correct.stat").read()
    pipeline.correct_file(fq, bitmap, p, fmt=1, engine="jax")
    jax_out = gzip.open(fq + ".correct.fa.gz").read()
    jax_stat = open(fq + ".correct.stat").read()
    assert ref_out == jax_out
    assert ref_stat == jax_stat
