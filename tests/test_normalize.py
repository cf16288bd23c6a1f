"""Stage-0 tests: the per-row content sha256 invariant (BASELINE.json
input_hint) and multiset preservation through the stage."""

import hashlib
from collections import Counter

import pyarrow.parquet as pq

import ray.data as rd

from session_graph_ray.stages.normalize import features_view, normalize


def test_sha_invariant_and_multiset(tiny_corpus_dir):
    corpus = rd.read_parquet(f"{tiny_corpus_dir}/corpus")
    norm = normalize(corpus)
    tbl = norm.to_pandas()

    # per-row invariant: content_sha256 == sha256(content)
    for content, sha in zip(tbl["content"], tbl["content_sha256"]):
        assert hashlib.sha256(content.encode()).hexdigest() == sha

    # multiset of hashes preserved vs generator's invariants table
    inv = pq.read_table(f"{tiny_corpus_dir}/invariants.parquet").to_pandas()
    assert Counter(tbl["content_sha256"]) == Counter(inv["content_sha256"])
    assert Counter(tbl["file_id"]) == Counter(inv["file_id"])
    assert tbl["file_id"].is_unique


def test_features_view_drops_content(tiny_corpus_dir):
    corpus = rd.read_parquet(f"{tiny_corpus_dir}/corpus")
    feats = features_view(normalize(corpus))
    cols = feats.schema().names
    assert "content" not in cols  # wide-row rule: content never enters shuffles
    assert {"file_id", "content_sha256", "stem_norm", "tokens_bin"} <= set(cols)


def test_empty_rows_not_scorable(tiny_corpus_dir):
    corpus = rd.read_parquet(f"{tiny_corpus_dir}/corpus")
    tbl = normalize(corpus).to_pandas()
    empties = tbl[tbl["content"].str.strip() == ""]
    assert len(empties) > 0  # fixture plants them
    assert not empties["scorable"].any()
