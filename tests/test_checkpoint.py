"""Checkpoint/resume tests: rerun is skip-and-load; mid-run kill resumes at
the first incomplete stage with identical output (watermark semantics,
/root/reference/pipeline/bulk_process.py:83-99, at stage grain)."""

import json
import os

from session_graph_ray.config import ERConfig
from session_graph_ray.pipelines.er import STAGE_ORDER, run_er_pipeline
from session_graph_ray.state.checkpoint import CheckpointManager


def _assign_map(res):
    df = res.assignments.to_pandas()
    return dict(zip(df["file_id"], df["canonical_file_id"]))


def test_checkpoint_roundtrip_and_resume(tiny_corpus_dir, tmp_path):
    ck = str(tmp_path / "ckpt")
    cfg = ERConfig().scaled(4)

    res1 = run_er_pipeline(f"{tiny_corpus_dir}/corpus", cfg, checkpoint_dir=ck)
    base = _assign_map(res1)

    with open(os.path.join(ck, "manifest.json")) as f:
        manifest = json.load(f)
    for s in STAGE_ORDER:
        assert manifest["stages"][s]["status"] == "done"
        assert manifest["stages"][s]["partitions"], s

    # full rerun: every stage resumes from parquet
    res2 = run_er_pipeline(f"{tiny_corpus_dir}/corpus", cfg, checkpoint_dir=ck)
    assert all(res2.metrics[s]["resumed"] for s in STAGE_ORDER)
    assert _assign_map(res2) == base

    # simulate a kill after 'scores': later stages are wiped, earlier kept
    cm = CheckpointManager(ck)
    cm.invalidate_from("edges", STAGE_ORDER)
    res3 = run_er_pipeline(f"{tiny_corpus_dir}/corpus", cfg, checkpoint_dir=ck)
    assert res3.metrics["features"]["resumed"]
    assert res3.metrics["scores"]["resumed"]
    assert not res3.metrics["edges"]["resumed"]
    assert _assign_map(res3) == base


def test_config_change_invalidates(tiny_corpus_dir, tmp_path):
    ck = str(tmp_path / "ckpt2")
    cfg = ERConfig().scaled(4)
    run_er_pipeline(f"{tiny_corpus_dir}/corpus", cfg, checkpoint_dir=ck)
    cfg2 = ERConfig(score_threshold=0.8).scaled(4)
    res = run_er_pipeline(f"{tiny_corpus_dir}/corpus", cfg2, checkpoint_dir=ck)
    assert not res.metrics["features"]["resumed"]  # fingerprint includes config
