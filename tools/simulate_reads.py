"""Simulated test data generator (replaces the external `pirs` simulator used
by test/00.raw_reads/work.sh:1-5 in the reference, which is not shipped).

Generates a random genome with planted repeats (to exercise branch/bubble
handling), paired-end reads with an Illumina-like position-dependent error
profile, and Phred+33 qualities consistent with the error draws, writing
one-line FASTQ.gz files the reference binaries accept.
"""

from __future__ import annotations

import gzip

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_genome(length: int, seed: int = 0, repeat_frac: float = 0.05,
                repeat_unit: int = 700) -> np.ndarray:
    """Random genome (uint8 ASCII) with a few duplicated segments."""
    rng = np.random.default_rng(seed)
    g = BASES[rng.integers(0, 4, size=length)]
    # plant exact repeats: copy a few segments elsewhere
    n_rep = int(length * repeat_frac / repeat_unit)
    for _ in range(n_rep):
        src = int(rng.integers(0, length - repeat_unit))
        dst = int(rng.integers(0, length - repeat_unit))
        g[dst:dst + repeat_unit] = g[src:src + repeat_unit]
    return g


def simulate_pe(genome: np.ndarray, read_len: int, insert: int, depth: float,
                seed: int = 1, err_start: float = 0.001, err_end: float = 0.02,
                insert_sd_frac: float = 0.05):
    """Simulate PE reads. Returns (reads1, quals1, reads2, quals2) as
    [N, read_len] uint8 ASCII arrays. R2 is the reverse complement end."""
    rng = np.random.default_rng(seed)
    glen = len(genome)
    n_pairs = int(glen * depth / (2 * read_len))
    inserts = np.clip(rng.normal(insert, insert * insert_sd_frac,
                                 n_pairs).astype(int), 2 * read_len, None)
    starts = rng.integers(0, np.maximum(glen - inserts, 1))
    # error probability profile along the read (rising toward the 3' end)
    prof = err_start + (err_end - err_start) * \
        (np.arange(read_len) / max(read_len - 1, 1)) ** 2

    comp = np.zeros(256, dtype=np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        comp[a] = b

    def extract(start_arr, rc: bool):
        idx = start_arr[:, None] + np.arange(read_len)[None, :]
        seq = genome[idx].copy()
        if rc:
            seq = comp[seq[:, ::-1]]
        err = rng.random((len(start_arr), read_len)) < prof[None, :]
        # substitute with one of the other three bases
        shift = rng.integers(1, 4, size=seq.shape).astype(np.uint8)
        code = np.searchsorted(BASES, seq)  # ACGT sorted so this works
        seq = np.where(err, BASES[(code + shift) % 4], seq)
        # Phred quals: high for correct draw, low for likely-error positions
        q = np.clip((-10 * np.log10(np.maximum(prof[None, :], 1e-5)))
                    .astype(int) + rng.integers(-3, 4, seq.shape), 2, 41)
        q = np.where(err & (rng.random(seq.shape) < 0.7),
                     rng.integers(2, 15, seq.shape), q)
        return seq, (q + 33).astype(np.uint8)

    r1, q1 = extract(starts, rc=False)
    r2, q2 = extract(starts + inserts - read_len, rc=True)
    return r1, q1, r2, q2


def write_fq_gz(path: str, prefix: str, reads: np.ndarray, quals: np.ndarray,
                mate: int) -> None:
    out = bytearray()
    for i in range(len(reads)):
        out += (f"@{prefix}_{i+1}/{mate}\n").encode()
        out += reads[i].tobytes() + b"\n+\n" + quals[i].tobytes() + b"\n"
    with gzip.open(path, "wb", compresslevel=4) as f:
        f.write(bytes(out))


def write_genome_fa(path: str, genome: np.ndarray, name: str = "sim_genome",
                    width: int = 70) -> None:
    with open(path, "wb") as f:
        f.write(f">{name}\n".encode())
        for i in range(0, len(genome), width):
            f.write(genome[i:i + width].tobytes() + b"\n")


def generate_dataset(outdir: str, genome_len: int = 300_000,
                     read_len: int = 150, depth: float = 20.0,
                     inserts=(400, 800), seed: int = 0) -> dict:
    """Generate a full multi-library dataset; returns paths dict."""
    import os
    os.makedirs(outdir, exist_ok=True)
    genome = make_genome(genome_len, seed=seed)
    gpath = os.path.join(outdir, "sim_genome.fa")
    write_genome_fa(gpath, genome)
    paths = {"genome": gpath, "libs": []}
    for ins in inserts:
        r1, q1, r2, q2 = simulate_pe(genome, read_len, ins, depth,
                                     seed=seed + ins)
        p1 = os.path.join(outdir, f"sim_insert{ins}_1.fq.gz")
        p2 = os.path.join(outdir, f"sim_insert{ins}_2.fq.gz")
        write_fq_gz(p1, f"read_{ins}", r1, q1, 1)
        write_fq_gz(p2, f"read_{ins}", r2, q2, 2)
        paths["libs"].append((p1, p2, ins))
    return paths


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--genome-len", type=int, default=300_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--depth", type=float, default=20.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    paths = generate_dataset(args.outdir, args.genome_len, args.read_len,
                             args.depth, seed=args.seed)
    print(paths)
