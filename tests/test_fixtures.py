"""Generator determinism + label sanity."""

import hashlib

import pyarrow.parquet as pq

from session_graph_ray.fixtures import generate_corpus


def _file_hash(p):
    return hashlib.sha256(open(p, "rb").read()).hexdigest()


def test_generator_deterministic(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    s1 = generate_corpus(d1, size="tiny")
    s2 = generate_corpus(d2, size="tiny")
    assert s1["rows"] == s2["rows"]
    for f in ["corpus/part-00000.parquet", "labeled_pairs.parquet",
              "expected_clusters.parquet", "invariants.parquet"]:
        assert _file_hash(f"{d1}/{f}") == _file_hash(f"{d2}/{f}"), f


def test_labels_reference_real_rows(tiny_corpus_dir):
    inv = pq.read_table(f"{tiny_corpus_dir}/invariants.parquet").to_pandas()
    lp = pq.read_table(f"{tiny_corpus_dir}/labeled_pairs.parquet").to_pandas()
    ids = set(inv["file_id"])
    assert set(lp["file_id_a"]) <= ids and set(lp["file_id_b"]) <= ids
    assert (lp["file_id_a"] < lp["file_id_b"]).all()
    assert lp["is_match"].any() and (~lp["is_match"]).any()


def test_expected_clusters_partition(tiny_corpus_dir):
    ec = pq.read_table(f"{tiny_corpus_dir}/expected_clusters.parquet").to_pandas()
    # canonical is the min file_id within each cluster
    for _, g in ec.groupby("cluster_id"):
        assert (g["canonical_file_id"] == g["file_id"].min()).all()
    assert ec["file_id"].is_unique
