"""Skew-robustness tests (round-2 verdict items #1/#2 and the advice
finding): oversized exact-duplicate groups must resolve to ONE cluster, and
a planted hot MinHash band must not blow up O(n^2)."""

import time

import pyarrow as pa

import ray.data as rd

from session_graph_ray.config import ERConfig


def test_oversized_exact_cluster_single_canonical():
    """>block_cap identical files (vendored licenses at 10^12 scale): the
    round-1 salted splitting fragmented these into ceil(n/cap) clusters;
    the exact-family star must yield exactly one."""
    from session_graph_ray.pipelines.er import run_er_pipeline
    import pyarrow.parquet as pq
    import tempfile, os

    n = 200
    content = "MIT License\nPermission is hereby granted, free of charge\n" * 5
    rows = {
        "repo": [f"org/r{i}" for i in range(n)],
        "path": [f"pkg{i}/LICENSE.txt" for i in range(n)],
        "commit": [f"{i:040d}" for i in range(n)],
        "lang": ["markdown"] * n,
        "content": [content] * n,
    }
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table(rows), os.path.join(d, "corpus.parquet"))
        cfg = ERConfig(block_cap=16).scaled(4)
        res = run_er_pipeline(os.path.join(d, "corpus.parquet"), cfg)
        out = res.assignments.to_pandas()
    assert len(out) == n
    assert out["canonical_file_id"].nunique() == 1
    # star pairs: n-1 exact candidate pairs, not O(n^2/chunks)
    assert res.pairs.count() <= 2 * n  # star + at most a few stem-chunk pairs


def test_hot_band_no_quadratic_blowup():
    """1k near-identical short docs share every MinHash band; the shared
    skew machinery must keep candidate pairs ~O(n * cap), not n^2/2."""
    from session_graph_ray.ops.dedup import minhash_candidate_pairs
    from session_graph_ray.ops.pairing import split_metric_rows

    n = 1000
    base = "spam spam spam wonderful spam lovely spam egg and spam"
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                # identical text: exact-star path, NOT pairwise
                "text": pa.array([base] * n, pa.string()),
            }
        )
    )
    cfg = ERConfig(block_cap=64).scaled(4)
    t0 = time.time()
    pairs = minhash_candidate_pairs(docs, cfg=cfg).materialize()
    clean, metrics = split_metric_rows(pairs, cfg)
    n_pairs = clean.count()
    elapsed = time.time() - t0
    # identical docs ride the sha star: exactly n-1 pairs
    assert n_pairs == n - 1, n_pairs
    assert elapsed < 60, f"hot band took {elapsed:.1f}s"


def test_hot_band_near_identical_capped():
    """Near-identical (but distinct) docs in one hot band are chunk-capped
    with counted truncation and star bridges keep them connectable."""
    from session_graph_ray.ops.dedup import near_dedup_assignments
    from session_graph_ray.config import ERConfig

    n = 300
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(
                    [
                        f"the quick brown fox jumps over the lazy dog "
                        f"and file number {i} runs far away into the woods"
                        for i in range(n)
                    ],
                    pa.string(),
                ),
            }
        )
    )
    cfg = ERConfig(block_cap=32).scaled(4)
    out = near_dedup_assignments(docs, threshold=0.5, cfg=cfg).to_pandas()
    assert len(out) == n
    # high-similarity family: the capped+bridged pairing must still merge
    # the overwhelming majority into one cluster
    top = out["canonical_doc_id"].value_counts().iloc[0]
    assert top >= n * 0.9
