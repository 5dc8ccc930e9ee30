"""CLI smoke tests — every subcommand parses and runs on tiny inputs."""

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import golden  # noqa: E402
from dbg_assembly_tpu.cli import main  # noqa: E402


def _write_fq(path, n=50, L=80, seed=0):
    rng = np.random.default_rng(seed)
    with gzip.open(path, "wb") as f:
        for i in range(n):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * L}\n".encode())


def test_cli_clean_and_kmerfreq(tmp_path):
    fq = str(tmp_path / "in.fq.gz")
    _write_fq(fq)
    out = str(tmp_path / "out.gz")
    stat = str(tmp_path / "out.stat")
    assert main(["clean_lowqual", "-e", "0.01", "-r", "20", fq, out,
                 stat]) == 0
    out2 = str(tmp_path / "out2.gz")
    stat2 = str(tmp_path / "out2.stat")
    assert main(["clean_adapter", "-s", "12", "-r", "20", out, out2,
                 stat2]) == 0
    lib = str(tmp_path / "r.lib")
    open(lib, "w").write(out2 + "\n")
    assert main(["kmerfreq", "-k", "9", "-m", "1", lib]) == 0
    assert os.path.exists(lib + ".kmer.freq.cz")
    assert main(["correct_error_reads", "-k", "9", "-c", "1", "-r", "20",
                 lib + ".kmer.freq.cz", lib]) == 0
    assert os.path.exists(out2 + ".correct.fa.gz")


def test_cli_contig_and_stats(tmp_path):
    ds = golden.sim_dataset()
    lib = str(tmp_path / "reads.lib")
    open(lib, "w").write(ds["libs"][0][0] + "\n")
    prefix = str(tmp_path / "asm")
    assert main(["debruijn_contig", "-k", "21", "-i", "0.001", "-f", "1",
                 "-o", prefix, lib]) == 0
    fa = prefix + ".contig.seq.fa"
    assert os.path.exists(fa)
    assert main(["fasta_len", fa]) == 0
    assert main(["seqlen_stat", fa + ".len"]) == 0
    assert os.path.exists(fa + ".len.stat")
