"""Stage 2 — pairwise scoring: stateful actor pool over candidate-pair batches.

Reference semantic carried over: thresholded, cached, confidence-scored
linking with a deterministic tie-break ladder (exact > alias > keyword,
``/root/reference/pipeline/link_entities.py:374-400, 531-537, 677-686``)
becomes a deterministic score ladder:

    content_sha256 equal            -> score 1.0 (short-circuit, no features)
    else   0.30 * JaroWinkler(stem) + 0.35 * tokenJaccard(identifiers)
         + 0.35 * LevenshteinSim(content[:256])
    emit match edge iff score >= 0.70 (the reference's confidence gate,
    ``link_entities.py:57``)

Execution: ``map_batches(PairScorer, concurrency=N, num_cpus=1)``. Each actor
holds one in-process DuckDB connection (built once in ``__init__``, reference
analog: per-worker client construction ``llm_providers.py:65-228``) and scores
each Arrow batch with a single vectorized SQL projection — C++ string-distance
kernels, zero Python per-pair loops. DuckDB is a public, baked-in library;
no external services are involved.

Feature enrichment: candidate pairs carry only ids; features join in via two
hash-partitioned ``Dataset.join`` calls against the compact feature view
(content projected away — wide-row rule, SURVEY.md §7.4). Pairs whose block
was ``sha:`` (route==0) bypass the join entirely: exact-content pairs are
emitted at score 1.0 straight from the pair table.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..config import ERConfig

_SCORE_SQL_TEMPLATE = """
WITH feat AS (
  SELECT
    id_a, id_b, block_key,
    sha_a = sha_b AS exact,
    jaro_winkler_similarity(stem_a, stem_b) AS jw_raw,
    CASE WHEN tokens_a = '' OR tokens_b = '' THEN 0.0
         ELSE COALESCE(
           len(list_intersect(string_split(tokens_a, chr(31)),
                              string_split(tokens_b, chr(31))))::DOUBLE
             / NULLIF(len(list_distinct(list_concat(
                 string_split(tokens_a, chr(31)),
                 string_split(tokens_b, chr(31))))), 0),
           0.0) END AS tj_raw,
    1.0 - levenshtein(trunc_a, trunc_b)::DOUBLE
        / GREATEST(len(trunc_a), len(trunc_b), 1) AS lev_raw
  FROM batch
)
SELECT
  id_a, id_b, block_key,
  CASE WHEN exact THEN 1.0 ELSE jw_raw END  AS jw,
  CASE WHEN exact THEN 1.0 ELSE tj_raw END  AS tj,
  CASE WHEN exact THEN 1.0 ELSE lev_raw END AS lev_sim,
  CASE WHEN exact THEN 1.0
       ELSE {w_jw} * jw_raw + {w_tj} * tj_raw + {w_lev} * lev_raw END AS score
FROM feat
"""


class PairScorer:
    """Callable class for ``map_batches`` — one DuckDB connection per actor."""

    def __init__(self, cfg: ERConfig):
        import duckdb

        self.cfg = cfg
        self.con = duckdb.connect()
        self.con.execute("SET threads TO 1")  # the actor owns exactly 1 CPU
        self.sql = _SCORE_SQL_TEMPLATE.format(
            w_jw=cfg.w_jw, w_tj=cfg.w_tj, w_lev=cfg.w_lev
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_scores()
        self.con.register("batch", batch)
        out = self.con.execute(self.sql).arrow()
        self.con.unregister("batch")
        return out.cast(_scores_schema())


def _scores_schema() -> pa.Schema:
    return pa.schema(
        [
            ("id_a", pa.string()),
            ("id_b", pa.string()),
            ("block_key", pa.string()),
            ("jw", pa.float64()),
            ("tj", pa.float64()),
            ("lev_sim", pa.float64()),
            ("score", pa.float64()),
        ]
    )


def _empty_scores() -> pa.Table:
    return _scores_schema().empty_table()


def _rename_for_side(ds: "ray.data.Dataset", side: str) -> "ray.data.Dataset":
    from ..ops.join import rename_batches

    return rename_batches(
        ds,
        {
            "file_id": f"fid_{side}",
            "content_sha256": f"sha_{side}",
            "stem_norm": f"stem_{side}",
            "tokens_str": f"tokens_{side}",
            "content_trunc": f"trunc_{side}",
        },
    )


def score_pairs(
    pairs: "ray.data.Dataset",
    features: "ray.data.Dataset",
    cfg: ERConfig,
) -> "ray.data.Dataset":
    """(id_a, id_b, block_key, route) × features -> scored edges.

    Returns every scored pair (thresholding is the caller's concern so the
    scores table can be checkpointed *including* non-matches — the reference
    caches negative results too, ``link_entities.py:283-329``).
    """
    feat = features.select_columns(
        ["file_id", "content_sha256", "stem_norm", "tokens_str", "content_trunc"]
    )

    def _route_filter(want_zero: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = pa.compute.equal(t["route"], pa.scalar(0))
            return t.filter(mask if want_zero else pa.compute.invert(mask))

        return f

    # vectorized route split (a row-wise ds.filter(lambda) here costs seconds
    # per million pairs)
    sha_pairs = pairs.map_batches(_route_filter(True), batch_format="pyarrow",
                                  batch_size=cfg.pair_batch_size)
    fuzzy_pairs = pairs.map_batches(_route_filter(False), batch_format="pyarrow",
                                    batch_size=cfg.pair_batch_size)

    def sha_to_scores(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        one = pa.array([1.0] * n, pa.float64())
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "block_key": batch.column("block_key"),
                "jw": one,
                "tj": one,
                "lev_sim": one,
                "score": one,
            }
        )

    exact_scored = sha_pairs.map_batches(
        sha_to_scores, batch_format="pyarrow", batch_size=cfg.pair_batch_size
    )

    from ..ops.join import bucket_join

    fa = _rename_for_side(feat, "a")
    fb = _rename_for_side(feat, "b")
    def _feat_schema(side: str) -> pa.Schema:
        return pa.schema(
            [(f"fid_{side}", pa.string()), (f"sha_{side}", pa.string()),
             (f"stem_{side}", pa.string()), (f"tokens_{side}", pa.string()),
             (f"trunc_{side}", pa.string())]
        )

    pairs_schema = pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()), ("block_key", pa.string())]
    )
    enriched = bucket_join(
        bucket_join(
            fuzzy_pairs.select_columns(["id_a", "id_b", "block_key"]),
            fa, left_on="id_a", right_on="fid_a",
            num_buckets=cfg.join_partitions * 4,
            left_schema=pairs_schema, right_schema=_feat_schema("a"),
        ),
        fb, left_on="id_b", right_on="fid_b",
        num_buckets=cfg.join_partitions * 4,
        left_schema=pa.schema(list(pairs_schema) + list(_feat_schema("a"))),
        right_schema=_feat_schema("b"),
    )

    fuzzy_scored = enriched.map_batches(
        PairScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.pair_batch_size,
        concurrency=cfg.scorer_concurrency,
        num_cpus=1,
    )
    return exact_scored.union(fuzzy_scored)


def match_edges(scores: "ray.data.Dataset", cfg: ERConfig) -> "ray.data.Dataset":
    """Confidence gate (reference: emit owl:sameAs only when >= 0.7)."""
    thr = cfg.score_threshold
    return scores.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["score"], pa.scalar(thr))),
        batch_format="pyarrow",
        batch_size=cfg.pair_batch_size,
    )
