import io
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import golden  # noqa: E402


def test_simulate_lowfreq_kmer_matches_reference(tmp_path):
    from tools.simulate_reads import make_genome, write_genome_fa
    from tools import simulate_lowfreq_kmer as slk

    genome = make_genome(60_000, seed=3)
    fa = str(tmp_path / "g.fa")
    write_genome_fa(fa, genome)

    ref = subprocess.run(
        ["/root/reference/correct_error/simulate_lowfreq_kmer",
         "-k", "13", "-s", "100", fa],
        capture_output=True, check=True, timeout=300).stdout.decode()

    buf = io.StringIO()
    slk.run(fa, ksize=13, skip=100, out=buf)
    assert ref == buf.getvalue()
