"""Two-table record linkage (pipelines/linkage.py).

Fixture: split the tiny corpus into a REFERENCE table (one canonical row
per expected cluster) and a DIRTY table (every other row). Ground truth
comes from the fixture's own labeled_pairs/expected_clusters:

- precision: every emitted link must point at the linked row's own
  cluster canonical (the only same-cluster row present in the reference);
- recall (direct evidence): every dirty row whose pair with its canonical
  is a labeled TRUE pair must be linked — linkage has no transitive glue,
  so only direct-edge truth is owed.
"""

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def link_tables(tiny_corpus_dir, tmp_path_factory):
    from session_graph_ray.stages.normalize import normalize

    tmp = tmp_path_factory.mktemp("link")
    corpus = rd.read_parquet(f"{tiny_corpus_dir}/corpus").to_pandas()
    norm = normalize(rd.read_parquet(f"{tiny_corpus_dir}/corpus")).to_pandas()
    clusters = pq.read_table(
        f"{tiny_corpus_dir}/expected_clusters.parquet").to_pandas()
    norm = norm.merge(clusters[["file_id", "canonical_file_id"]], on="file_id")
    assert len(norm) == len(corpus)

    is_ref = (norm["file_id"] == norm["canonical_file_id"]).to_numpy()
    raw_cols = list(corpus.columns)
    ref_pd, dirty_pd = norm[is_ref][raw_cols], norm[~is_ref][raw_cols]
    ref_p, dirty_p = str(tmp / "ref.parquet"), str(tmp / "dirty.parquet")
    ref_pd.to_parquet(ref_p, index=False)
    dirty_pd.to_parquet(dirty_p, index=False)

    truth = norm[~is_ref][["file_id", "canonical_file_id"]]
    pairs = pq.read_table(
        f"{tiny_corpus_dir}/labeled_pairs.parquet").to_pandas()
    true_pairs = {
        frozenset((a, b))
        for a, b, m in zip(pairs["file_id_a"], pairs["file_id_b"],
                           pairs["is_match"]) if m
    }
    return ref_p, dirty_p, truth, true_pairs


def test_link_tables_precision_and_direct_recall(link_tables):
    from session_graph_ray.pipelines.linkage import run_er_link

    ref_p, dirty_p, truth, true_pairs = link_tables
    out = run_er_link(ref_p, dirty_p).to_pandas()

    assert not out["dirty_file_id"].duplicated().any()  # best-match = 1 row

    canon = dict(zip(truth["file_id"], truth["canonical_file_id"]))
    # precision: a link may only point at the row's own canonical
    for d, r in zip(out["dirty_file_id"], out["ref_file_id"]):
        assert canon[d] == r, (d, r, canon[d])

    # direct-evidence recall: labeled TRUE (dirty, canonical) pairs must link
    linked = set(out["dirty_file_id"])
    owed = [d for d, c in canon.items() if frozenset((d, c)) in true_pairs]
    assert owed, "fixture lost its labeled direct pairs"
    missing = [d for d in owed if d not in linked]
    assert not missing, missing

    assert (out["score"] >= 0.0).all() and (out["score"] <= 1.0).all()


def test_link_exact_copy_scores_one(link_tables, tmp_path):
    """A dirty row byte-identical to a reference row must link at 1.0
    through the sha short-circuit route."""
    from session_graph_ray.pipelines.linkage import run_er_link

    ref_p, dirty_p, _, _ = link_tables
    ref = pd.read_parquet(ref_p)
    copy = ref.head(3).copy()
    copy["path"] = copy["path"] + ".copy"  # new identity, same content
    dirty2 = str(tmp_path / "dirty2.parquet")
    pd.concat([pd.read_parquet(dirty_p), copy]).to_parquet(dirty2, index=False)

    out = run_er_link(ref_p, dirty2).to_pandas()
    # sha-equal pairs ride the exact route: score exactly 1.0
    ones = out[out["score"] == 1.0]
    assert len(ones) >= 3
