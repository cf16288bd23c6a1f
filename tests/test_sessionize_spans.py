"""Vectorized sessionization: span correctness incl. users that share a
hash bucket (the per-user 0-based session-id offset logic), and the
empty-match checkpoint round-trip (advice finding: a no-match corpus must
checkpoint and resume, not crash on a zero-file stage)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def test_session_spans_bucket_collision():
    from session_graph_ray.ops.sessionize import session_spans

    t0 = np.datetime64("2024-01-01T00:00:00")
    m = np.timedelta64(1, "m")
    rows = [
        {"user_id": 1, "ts": t0},
        {"user_id": 1, "ts": t0 + 10 * m},
        {"user_id": 1, "ts": t0 + 120 * m},
        {"user_id": 2, "ts": t0 + 5 * m},
        {"user_id": 2, "ts": t0 + 200 * m},
        {"user_id": 2, "ts": t0 + 210 * m},
        {"user_id": 65, "ts": t0},  # 65 % 64 == 1: same bucket as user 1
        {"user_id": 65, "ts": t0 + 300 * m},
    ]
    out = (
        session_spans(rd.from_items(rows))
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    got = list(zip(out["user_id"], out["session_id"], out["n_events"]))
    assert got == [(1, 0, 2), (1, 1, 1), (2, 0, 1), (2, 1, 2),
                   (65, 0, 1), (65, 1, 1)]


def test_no_match_corpus_checkpoints_and_resumes(tmp_path):
    """All-singleton corpus -> zero match edges; the empty edges/labels
    stages must write resumable checkpoints (advice: empty write_parquet
    used to leave nothing for os.replace / read_parquet)."""
    from session_graph_ray.config import ERConfig
    from session_graph_ray.pipelines.er import STAGE_ORDER, run_er_pipeline

    n = 30
    rows = {
        "repo": [f"r{i}" for i in range(n)],
        "path": [f"dir{i}/u{i}.py" for i in range(n)],
        "commit": [f"{i:040d}" for i in range(n)],
        "lang": ["python"] * n,
        # contents pairwise dissimilar: no shared stems, shas, or shingles
        "content": [
            "\n".join(f"def z{i}_{j}(a{i}_{j}): return a{i}_{j} + {j}"
                      for j in range(6))
            for i in range(n)
        ],
    }
    src = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.table(rows), src)
    ck = str(tmp_path / "ckpt")
    cfg = ERConfig().scaled(4)

    res = run_er_pipeline(src, cfg, checkpoint_dir=ck)
    out = res.assignments.to_pandas()
    assert len(out) == n
    assert (out["file_id"] == out["canonical_file_id"]).all()  # all singleton

    res2 = run_er_pipeline(src, cfg, checkpoint_dir=ck)
    assert all(res2.metrics[s]["resumed"] for s in STAGE_ORDER)
    out2 = res2.assignments.to_pandas()
    assert sorted(out2["file_id"]) == sorted(out["file_id"])
