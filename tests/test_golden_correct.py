"""Golden test of the error-correction stage: our kmerfreq replacement
produces the .cz table, the shipped correct_error_reads consumes it, and our
corrector must reproduce its output byte-for-byte."""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest  # noqa: E402
import golden  # noqa: E402


def _diff(a: bytes, b: bytes, label: str):
    if a == b:
        return
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            lo = max(0, i - 100)
            raise AssertionError(
                f"{label}: first diff at byte {i}\n"
                f"ref:  ...{a[lo:i+150]!r}\n"
                f"ours: ...{b[lo:i+150]!r}")
    raise AssertionError(f"{label}: length differs {len(a)} vs {len(b)}")


@pytest.fixture(scope="module")
def correction_setup(tmp_path_factory):
    """Cleaned reads + our .cz table + reference correction outputs."""
    d = tmp_path_factory.mktemp("corr")
    ds = golden.sim_dataset()
    cleaned = []
    for p1, p2, ins in ds["libs"][:1]:     # one library (2 files) is enough
        for p in (p1, p2):
            lq = golden.ref_clean_lowqual(p, err=0.01, min_len=75)
            ad = golden.ref_clean_adapter(lq["out"], score=12, min_len=75)
            local = d / os.path.basename(ad["out"])
            shutil.copy(ad["out"], local)
            cleaned.append(str(local))
    lib = d / "clean_reads.lib"
    lib.write_text("".join(p + "\n" for p in cleaned))

    from dbg_assembly_tpu.kmer import kmerfreq
    kf = kmerfreq.run(str(lib), ksize=17, low_freq_cutoff=1)

    golden.ref_correct(kf["cz"], str(lib), k=17, c=2, workdir=str(d))
    ref_out = {p: {"out": p + ".correct.fa.gz", "stat": p + ".correct.stat"}
               for p in cleaned}
    # stash reference outputs aside so ours can write to the same paths
    for p, v in ref_out.items():
        shutil.move(v["out"], v["out"] + ".ref")
        shutil.move(v["stat"], v["stat"] + ".ref")
    return {"lib": str(lib), "cz": kf["cz"], "files": cleaned}


def test_correct_golden(correction_setup):
    from dbg_assembly_tpu.correct import pipeline
    from dbg_assembly_tpu.correct.engine import CorrectParams

    cs = correction_setup
    params = CorrectParams(ksize=17, max_change=2)
    pipeline.run(cs["cz"], cs["lib"], params, fmt=1)

    for p in cs["files"]:
        _diff(golden.gunzip_bytes(p + ".correct.fa.gz.ref"),
              golden.gunzip_bytes(p + ".correct.fa.gz"),
              os.path.basename(p) + " corrected")
        _diff(golden.read_bytes(p + ".correct.stat.ref"),
              golden.read_bytes(p + ".correct.stat"),
              os.path.basename(p) + " stat")
