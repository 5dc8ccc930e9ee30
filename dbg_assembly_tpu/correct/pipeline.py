"""correct_error_reads driver: 1-bit table in, corrected one-line FASTA out.

Parity: main_parallel_senior.cpp:142-269,507-679 — per input file writes
<file>.correct.fa.gz (header + "\\tModifiedBaseNum/FinalReadLength/
LeftEndTrim/RightEndTrim/IsDeleted" annotations, deleted reads emitted with
an empty sequence line) and <file>.correct.stat.  Optional read1/read2
pairing merge (merge_two_corr_files, correct.cpp:851-922).
"""

from __future__ import annotations

import gzip

import numpy as np

from ..io import cz as czio
from ..io import fastq, stat as statio
from ..kmer import count as kc
from .engine import CorrectParams, ReadCorrector, classify_regions_batch


def load_bitmap(cz_path: str, ksize: int) -> np.ndarray:
    """Load the 1-bit .cz table and OR in reverse-complement bits
    (make_kmerFreq_1bit_table_from_1BitGz + thread_setrevcompkmer,
    main_parallel_senior.cpp:334-408,310-329)."""
    bm = czio.read_cz_bits(cz_path, ksize)
    return kc.expand_bitmap_rc(bm, ksize)


def correct_file(path: str, bitmap: np.ndarray, params: CorrectParams,
                 fmt: int = 1) -> dict:
    p = params.resolved()
    batch = fastq.read_batch(path, fmt="fq" if fmt == 1 else "fa",
                             strict_n=False, keep_ascii=True)
    n = batch.n_reads
    lengths = batch.lengths.astype(np.int64)
    bits = classify_regions_batch(batch.codes, batch.lengths, bitmap,
                                  p.ksize)
    corr = ReadCorrector(bitmap, p)

    num_raw_reads = n
    num_raw_bases = int(lengths.sum())
    num_res_reads = 0
    num_res_bases = 0
    num_trimmed_reads = 0
    num_trimmed_bases = 0
    num_deleted_reads = 0
    one_total = 0
    multi_total = 0

    out = bytearray()
    for i in range(n):
        L = int(lengths[i])
        head = batch.heads[i]
        if fmt == 1 and head[:1] == b"@":
            head = b">" + head[1:]
        read = bytearray(batch.seqs_ascii[i, :L].tobytes())
        if L >= p.ksize:
            one, multi, deleted, tl, tr = corr.correct_one_read(
                read, bits[i, :max(L - p.ksize + 1, 0)])
        else:
            # reads shorter than k have no k-mer regions: num_hRegs == 0
            one, multi, deleted, tl, tr = 0, 0, 1, 0, 0
        score = one + multi
        final_len = L - tl - tr
        if not deleted:
            one_total += one
            multi_total += multi
            if tl > 0 or tr > 0:
                read = read[tl:tl + final_len]
                num_trimmed_reads += 1
                num_trimmed_bases += tl + tr
            num_res_reads += 1
            num_res_bases += final_len
        else:
            num_deleted_reads += 1
            read = bytearray()
        out += (head + f"\tModifiedBaseNum: {score}"
                f"\tFinalReadLength: {len(read)}"
                f"\tLeftEndTrim: {tl}\tRightEndTrim: {tr}"
                f"\tIsDeleted: {deleted}".encode()
                + b"\n" + bytes(read) + b"\n")

    out_path = path + ".correct.fa.gz"
    with gzip.open(out_path, "wb", compresslevel=6) as f:
        f.write(bytes(out))
    statio.write_correct_stat(path + ".correct.stat", num_raw_reads,
                              num_raw_bases, num_res_reads, num_res_bases,
                              num_trimmed_reads, num_trimmed_bases,
                              num_deleted_reads, one_total, multi_total)
    return {"out": out_path, "stat": path + ".correct.stat",
            "res_reads": num_res_reads, "deleted": num_deleted_reads}


def run(cz_path: str, lib_path: str, params: CorrectParams | None = None,
        fmt: int = 1) -> list[dict]:
    from ..contig.pipeline import read_file_list

    if params is None:
        params = CorrectParams()
    bitmap = load_bitmap(cz_path, params.ksize)
    results = []
    for path in read_file_list(lib_path):
        results.append(correct_file(path, bitmap, params, fmt))
    return results
