"""Incremental near-dedup (ops/dedup.near_dedup_incremental): folding a new
batch into prior assignments must equal the from-scratch run, including
chains where a NEW doc bridges two previously separate OLD clusters."""

import numpy as np
import pandas as pd
import ray.data as rd

from session_graph_ray.ops.dedup import (
    near_dedup_assignments,
    near_dedup_incremental,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "into the deep green forest near the old stone bridge today while "
    "birds sing loudly above the quiet river bend at dawn"
)


def _corpus():
    """Old docs: two near-dup families + noise. New docs: a copy joining
    family A, a brand-new family, and a BRIDGE doc near both A and B."""
    fam_a = BASE
    fam_a2 = BASE.replace("stone", "wooden")
    fam_b = BASE.replace("quick brown fox", "slow grey wolf").replace(
        "lazy dog", "tired cat"
    )
    noise = (
        "completely different content about databases indexes and query "
        "planners in modern distributed systems for large scale analytics "
        "workloads with columnar storage and vectorized execution engines"
    )
    old = [
        {"doc_id": 1, "text": fam_a},
        {"doc_id": 2, "text": fam_a2},
        {"doc_id": 3, "text": fam_b},
        {"doc_id": 4, "text": noise},
    ]
    bridge = BASE.replace("quick brown fox", "slow grey wolf")
    new = [
        {"doc_id": 10, "text": fam_a + " extra trailing words"},
        {"doc_id": 11, "text": noise.replace("columnar", "row oriented")},
        {"doc_id": 12, "text": bridge},  # near A (1 edit region) and near B
    ]
    return old, new


def _assign(df):
    return dict(zip(df["doc_id"], df["canonical_doc_id"]))


def test_incremental_equals_from_scratch():
    old, new = _corpus()
    prev = near_dedup_assignments(rd.from_items(old), threshold=0.5)
    inc = (
        near_dedup_incremental(
            rd.from_items(old + new), prev, threshold=0.5
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    full = (
        near_dedup_assignments(rd.from_items(old + new), threshold=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, full)
    # and the bridge doc really merged the two old families
    m = _assign(inc)
    assert m[1] == m[3] == m[12]


def test_incremental_empty_prev_is_full_run():
    old, new = _corpus()
    empty_prev = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.array([], dtype="int64"),
                "canonical_doc_id": pd.array([], dtype="int64"),
            }
        )
    )
    inc = (
        near_dedup_incremental(rd.from_items(old + new), empty_prev, threshold=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    full = (
        near_dedup_assignments(rd.from_items(old + new), threshold=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, full)


def test_near_dedup_incremental_from_path_delta_keys(tmp_path):
    """Delta-only LSH key derivation (file-grain cache): day-2 increment
    shingles only the NEW file, and assignments equal a from-scratch run."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from session_graph_ray.ops.dedup import (
        near_dedup_assignments,
        near_dedup_incremental_from_path,
    )

    corpus = os.path.join(tmp_path, "docs")
    cache = os.path.join(tmp_path, "keycache")
    os.makedirs(corpus)

    old = [
        {"doc_id": i,
         "text": f"the quick brown fox jumps over dog number {i} "
                 f"with unique tail {i * 7}"}
        for i in range(40)
    ]
    # two exact near-dups of old docs + brand-new docs arrive on day 2
    new = [
        {"doc_id": 100, "text": old[3]["text"]},
        {"doc_id": 101, "text": old[11]["text"]},
        {"doc_id": 102, "text": "entirely novel content nothing like before"},
    ]
    pq.write_table(pa.Table.from_pylist(old),
                   os.path.join(corpus, "part-a.parquet"))

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "canonical_doc_id": pa.array([], pa.int64())})
    )
    asg1, m1 = near_dedup_incremental_from_path(
        corpus, empty, cache, threshold=0.5
    )
    asg1 = asg1.materialize()
    assert m1 == {"files_total": 1, "files_derived": 1}

    pq.write_table(pa.Table.from_pylist(new),
                   os.path.join(corpus, "part-b.parquet"))
    asg2, m2 = near_dedup_incremental_from_path(
        corpus, asg1, cache, threshold=0.5
    )
    assert m2 == {"files_total": 2, "files_derived": 1}

    scratch = (
        near_dedup_assignments(rd.from_items(old + new), threshold=0.5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = asg2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (got.values == scratch.values).all()
