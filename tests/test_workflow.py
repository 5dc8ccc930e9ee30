"""Smoke test of the L5 orchestration driver (full pipeline, small data)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import golden  # noqa: E402


def test_run_full_pipeline(tmp_path):
    from dbg_assembly_tpu.workflow import PipelineConfig, run_full
    from dbg_assembly_tpu.utils import nstat

    ds = golden.sim_dataset()
    raw_libs = [(p1, p2, ins) for p1, p2, ins in ds["libs"]]
    cfg = PipelineConfig(correct_k=13, init_hash_size=0.01,
                         map_min_read=100)
    out = run_full(raw_libs, cfg, str(tmp_path / "work"))
    assert os.path.exists(out["contigs"])
    assert os.path.exists(out["scaffolds"])
    # sanity: scaffolds assemble most of the 200kb genome
    lens = [ln for _, ln in nstat.fasta_lengths(out["scaffolds"])]
    assert sum(lens) > 150_000
    assert max(lens) > 5_000
