"""kmerfreq replacement — k-mer frequency table producer.

The external `kmerfreq` tool (sister repo of the reference, NOT shipped) is
replaced by the TPU counting engine.  Outputs, matching the formats consumed
by the reference binaries and shipped stat fixtures:

  <lib>.kmer.freq.cz / .cz.len   1-bit-per-kmer table: bit set at the
                                 CANONICAL index iff count > low_freq_cutoff
                                 (consumer spec main_parallel_senior.cpp:
                                 273-329; strict '>' per main.cpp:202)
  <lib>.kmer.freq.stat           spectrum table (format per
                                 test/01.clean_correct/clean_reads.lib.
                                 kmer.freq.stat), counters capped at 65535.
"""

from __future__ import annotations

import numpy as np

from ..io import cz as czio
from ..io import fastq, stat as statio
from . import count as kc


def run(lib_path: str, ksize: int = 17, low_freq_cutoff: int = 1,
        fmt: str | None = None, out_prefix: str | None = None,
        batch_reads: int = 200_000, table_format: str = "1bit") -> dict:
    """table_format '1bit': high/low bitmap (kmerfreq_16bit, consumed by
    correct_error_reads); '8bit': one saturated count byte per k-mer index
    (consumed by correct_error/correct_error_parallel,
    correct_error/main.cpp:161-220)."""
    from ..contig.pipeline import read_file_list

    prefix = out_prefix or (lib_path + ".kmer.freq")
    files = read_file_list(lib_path)
    counter = kc.KmerCounter(ksize, batch_reads=batch_reads)
    for path in files:
        batch = fastq.read_batch(path, fmt=fmt, strict_n=False,
                                 keep_heads=False)
        counter.add(batch.codes, batch.lengths)
    uniq, counts, total = counter.finalize()

    if table_format == "8bit":
        freqs = np.zeros(1 << (2 * ksize), dtype=np.uint8)
        freqs[uniq.astype(np.int64)] = np.minimum(counts, 255)
        czio.write_cz_bytes(prefix + ".cz", freqs)
        bitmap = None
    else:
        bitmap = kc.freq_bitmap(uniq, counts, ksize, low_freq_cutoff)
        czio.write_cz_bits(prefix + ".cz", bitmap)

    spec = kc.spectrum(counts, max_freq=65535)
    theory = 1 << (2 * ksize)
    statio.write_kmerfreq_stat(prefix + ".stat", ksize, 65535,
                               int(total), len(uniq), theory, spec)
    return {"cz": prefix + ".cz", "stat": prefix + ".stat",
            "species": len(uniq), "individuals": int(total),
            "bitmap": bitmap}
