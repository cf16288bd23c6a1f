"""The bucket-join feature-enrichment path (the 10^12-row plan, taken when
the feature table exceeds ERConfig.feature_broadcast_limit) must produce the
same scores as the indexed-scorer fast path."""

from dataclasses import replace

import ray.data as rd

from session_graph_ray.config import ERConfig
from session_graph_ray.ops.pairing import split_metric_rows
from session_graph_ray.stages.blocking import candidate_pairs
from session_graph_ray.stages.normalize import features_view, normalize, normalize_core
from session_graph_ray.stages.scoring import score_pairs


def _scores(cfg, tiny_corpus_dir):
    corpus = rd.read_parquet(f"{tiny_corpus_dir}/corpus")
    features = features_view(normalize(corpus)).materialize()
    pairs_raw = candidate_pairs(normalize_core(corpus), cfg).materialize()
    pairs, _ = split_metric_rows(pairs_raw, cfg)
    out = score_pairs(pairs, features, cfg,
                      n_features=features.count()).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_join_path_matches_indexed_path(tiny_corpus_dir):
    base = ERConfig().scaled(4)
    indexed = _scores(base, tiny_corpus_dir)
    joined = _scores(replace(base, feature_broadcast_limit=0), tiny_corpus_dir)
    assert len(indexed) == len(joined) > 0
    for col in ["id_a", "id_b", "score", "jw", "tj", "lev_sim"]:
        assert (indexed[col].values == joined[col].values).all(), col


def test_join_path_with_extras_takes_single_phase_and_matches(tiny_corpus_dir):
    """A registered scorer extra (which may reference any feature column)
    routes the join path through single-phase enrichment; with a weight-0
    extra the scores must stay bit-equal to the indexed path."""
    from session_graph_ray.registry import (
        register_scorer_feature,
        unregister_scorer_feature,
    )

    base = ERConfig().scaled(4)
    indexed = _scores(base, tiny_corpus_dir)

    @register_scorer_feature("zero_extra", weight=0.0)
    def _zero(batch):
        import numpy as np

        return np.zeros(batch.num_rows)

    try:
        joined = _scores(replace(base, feature_broadcast_limit=0),
                         tiny_corpus_dir)
    finally:
        unregister_scorer_feature("zero_extra")
    assert len(indexed) == len(joined) > 0
    for col in ["id_a", "id_b", "score", "jw", "tj", "lev_sim"]:
        assert (indexed[col].values == joined[col].values).all(), col
