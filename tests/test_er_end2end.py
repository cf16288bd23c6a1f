"""End-to-end: pairwise F1 >= 0.99 (BASELINE.json metric), exact cluster
recovery, and the row-multiset invariant through the whole pipeline."""

from collections import Counter

import pyarrow.parquet as pq

from session_graph_ray.eval import cluster_equality, pairwise_f1
from session_graph_ray.pipelines.er import match_metrics, run_er_pipeline


def test_er_tiny_f1_and_clusters(tiny_corpus_dir):
    res = run_er_pipeline(f"{tiny_corpus_dir}/corpus")

    f1 = pairwise_f1(res.assignments, f"{tiny_corpus_dir}/labeled_pairs.parquet")
    assert f1["f1"] >= 0.99, f1

    ce = cluster_equality(res.assignments, f"{tiny_corpus_dir}/expected_clusters.parquet")
    assert ce["missing"] == 0
    assert ce["exact_equal_frac"] == 1.0, ce

    # row multiset preserved: every input row appears exactly once in output
    inv = pq.read_table(f"{tiny_corpus_dir}/invariants.parquet").to_pandas()
    out = res.assignments.to_pandas()
    assert Counter(out["file_id"]) == Counter(inv["file_id"])

    m = match_metrics(res)
    assert m["rows"] == len(inv)
    assert m["match_edges"] <= m["candidate_pairs"]
    assert m["multi_clusters"] > 0
