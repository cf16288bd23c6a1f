"""Counted truncation + adjacent-chunk bridging for the embedding dedup
operators (VERDICT r2 #7 / ADVICE r2): a degenerate over-cap bucket must
(a) still link duplicate pairs that span ONE chunk cut — including pairs not
anchored at a chunk head — and (b) report the count of never-examined
(>= 2-cuts-apart) pairs as sentinel metric rows, never skip them silently.
"""

import numpy as np
import pytest
import ray.data as rd


def _vec_rows(n_dims=8, groups=None):
    """groups: list of (vec_id list, base_vector). Rows get tiny distinct
    jitter unless exact duplicates are requested."""
    rows = []
    for ids, base in groups:
        for vid in ids:
            rows.append({"vec_id": vid, "embedding": list(base)})
    return rows


def test_embedding_near_dup_bridges_one_cut_and_counts_skips():
    from session_graph_ray.ops.dedup import (
        embedding_near_dup_pairs,
        split_embedding_metric_rows,
    )

    # 10 rows, all in ONE LSH bucket (identical direction => same signs),
    # cap=4: chunks [0..3], [4..7], [8..9] by sorted vec_id.
    base = np.zeros(8)
    base[0] = 1.0
    rows = _vec_rows(groups=[(list(range(10)), base)])
    pairs = embedding_near_dup_pairs(
        rd.from_items(rows), threshold=0.99, bucket_cap=4
    )
    real, metrics = split_embedding_metric_rows(pairs)
    got = real.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    # examined pairs: within chunks (6+6+1) + adjacent cross (16+8) = 37;
    # never examined: chunk0 x chunk2 = 4*2 = 8
    assert len(got) == 37
    # a cut-spanning pair NOT anchored at a chunk head is present (3,4)..(3,7)
    assert ((got.id_a == 3) & (got.id_b == 4)).any()
    assert ((got.id_a == 1) & (got.id_b == 6)).any()
    assert len(metrics) == 1
    assert metrics.iloc[0]["id_b"] == 8  # the exact skipped-pair count
    assert metrics.iloc[0]["cosine"] == -2.0


def test_embedding_near_dup_no_sentinels_under_cap():
    from session_graph_ray.ops.dedup import (
        embedding_near_dup_pairs,
        split_embedding_metric_rows,
    )

    base = np.zeros(8)
    base[1] = 1.0
    rows = _vec_rows(groups=[(list(range(4)), base)])
    pairs = embedding_near_dup_pairs(
        rd.from_items(rows), threshold=0.99, bucket_cap=64
    )
    real, metrics = split_embedding_metric_rows(pairs)
    assert len(metrics) == 0
    assert real.count() == 6  # all pairs examined, none skipped


def test_semdedup_bridges_one_cut_without_head_anchor():
    """A dup pair spanning the chunk cut whose members are NOT the chunk
    heads must still merge (the r2 bridge only compared the new chunk's
    first row; ADVICE r2 flagged the miss)."""
    from session_graph_ray.ops.semdedup import semantic_dedup_assignments

    rng = np.random.RandomState(0)
    d = 8
    # ids 0..7 in one k-means cell (same dominant direction), cap=4:
    # chunks [0,1,2,3] and [4,5,6,7]. Plant ONE dup pair (3, 5): neither is
    # the head of chunk 2 (that's id 4). All other vectors are mutually
    # below threshold (distinct jitter).
    base = np.zeros(d)
    base[0] = 1.0
    rows = []
    for vid in range(8):
        v = base + 0.12 * rng.randn(d) * (0 if vid in (3, 5) else 1)
        if vid == 5:
            v = rows[3]["embedding"]  # exact copy of id 3
        rows.append({"vec_id": vid, "embedding": list(np.asarray(v))})
    asg = semantic_dedup_assignments(
        rd.from_items(rows), threshold=0.999, n_clusters=1,
        cluster_cap=4, emit_metrics=True,
    ).to_pandas()
    by_id = asg[asg.vec_id >= 0].set_index("vec_id")["rep_id"]
    assert by_id.loc[5] == 3  # cut-spanning dup inherits earlier rep
    assert by_id.loc[3] == 3
    # no >=2-cut pairs here (2 chunks) -> no sentinel rows
    assert (asg.vec_id >= 0).all()


def test_semdedup_counts_far_chunk_skips():
    from session_graph_ray.ops.semdedup import semantic_dedup_assignments

    d = 8
    base = np.zeros(d)
    base[0] = 1.0
    rng = np.random.RandomState(1)
    rows = [
        {"vec_id": i,
         "embedding": list(base + 0.1 * rng.randn(d))}
        for i in range(10)
    ]
    asg = semantic_dedup_assignments(
        rd.from_items(rows), threshold=0.9999, n_clusters=1,
        cluster_cap=4, emit_metrics=True,
    ).to_pandas()
    sent = asg[asg.vec_id == -1]
    # 10 rows, chunks 4/4/2: skipped = chunk0 x chunk2 = 8
    assert len(sent) == 1 and sent.iloc[0]["rep_id"] == 8
    # default emit_metrics=False keeps the output clean
    asg2 = semantic_dedup_assignments(
        rd.from_items(rows), threshold=0.9999, n_clusters=1,
        cluster_cap=4,
    ).to_pandas()
    assert (asg2.vec_id >= 0).all() and len(asg2) == 10
