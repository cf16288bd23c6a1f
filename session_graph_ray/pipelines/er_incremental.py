"""Incremental record linkage: fold a NEW batch of rows into an existing
clustering without re-scoring the old corpus against itself.

Reference semantic: the real-time loop (stop-hook -> queue -> consumer,
``/root/reference/hooks/stop_hook.sh:49-69``,
``/root/reference/docker/queue_consumer.py:98-111``) processes one new
session at a time against the already-built graph, with watermark skips for
already-seen content (``/root/reference/pipeline/bulk_process.py:83-99``).
Ray-Data form: one delta pipeline per arriving batch.

Exactness: the full pipeline's canonical id is the MIN ``file_id_u64``
reachable in the match-edge graph — a pure function of the edge set, not of
arrival order. The previous run's (id -> canonical) assignments are a star
over each old component, so

    components(prev_star_edges  U  edges_touching_new_rows)
        == components(all_edges)

and the incremental result equals the from-scratch run bit-for-bit (asserted
in tests). Cost model: SCORING — the expensive stage — runs only on pairs
with at least one new member, and with ``key_cache_dir`` set the blocking
keys and normalized features are ALSO delta-only (file-grain cache,
``state/filecache.py``): an increment derives them only for input files
never seen before, so every scan stage scales with the increment. The
old-vs-old pair drop is size-gated (``ops.join.drop_both_member_pairs``):
small prev-id sets broadcast once, huge ones go through bucketed left-join
flags — no driver pull of a 10^9-row id set.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from ..config import ERConfig
from ..functions.hashing import hex_to_u64
from ..ops.pairing import split_metric_rows
from ..stages.blocking import candidate_pairs
from ..stages.clustering import assignments, assignments_hex, propagate_labels
from ..stages.normalize import features_view, normalize, normalize_core
from ..stages.scoring import match_edges, score_pairs
from .er import ERResult


def _prev_star_u64(prev_assignments: "ray.data.Dataset") -> "ray.data.Dataset":
    """Hex (file_id, canonical_file_id) -> uint64 (id_a, id_b) star edges.
    Self-loops (singletons) are kept: harmless to propagation and they carry
    the old ids into the label table."""

    def conv(t: pa.Table) -> pa.Table:
        a = hex_to_u64(t.column("file_id").to_pylist())
        b = hex_to_u64(t.column("canonical_file_id").to_pylist())
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    return prev_assignments.map_batches(conv, batch_format="pyarrow")


def _blocking_cfg_fp(cfg: ERConfig) -> str:
    """Fingerprint of every cfg field the cached per-file tables depend on."""
    return (
        f"{cfg.minhash_num_perm}|{cfg.minhash_bands}|{cfg.minhash_seed}|"
        f"{cfg.shingle_k}|{cfg.content_token_cap}|{cfg.blocking_keys}"
    )


def run_er_incremental(
    corpus_path: str,
    prev_assignments: "ray.data.Dataset",
    cfg: ERConfig | None = None,
    key_cache_dir: str | None = None,
) -> ERResult:
    """Cluster the full corpus at ``corpus_path`` given ``prev_assignments``
    (the hex assignments output of an earlier run over a SUBSET of it).
    Returns a full ERResult whose ``assignments`` equal a from-scratch run.

    ``key_cache_dir``: optional file-grain cache root
    (``state.filecache.FileGrainCache``). When set, blocking keys AND
    normalized features are derived only for input files never seen before —
    an increment's scan cost is proportional to the increment, not the
    corpus (the reference's watermark skip,
    ``/root/reference/pipeline/bulk_process.py:83-99``, at derived-table
    grain). Both stages are pure per-row functions of one file + cfg, the
    contract file-grain reuse needs.
    """
    if cfg is None:
        from ..config import auto_config

        cfg = auto_config()

    prev_star = _prev_star_u64(prev_assignments).materialize()
    n_prev = prev_star.count()

    cache_metrics: dict = {}
    if key_cache_dir is not None:
        from ..sources.paths import filtered_paths
        from ..stages.blocking import derive_block_keys
        from ..state.filecache import FileGrainCache

        files = filtered_paths(corpus_path)
        cache = FileGrainCache(key_cache_dir)
        cfg_fp = _blocking_cfg_fp(cfg)
        keys, km = cache.dataset(
            files, "block_keys", cfg_fp,
            lambda p: derive_block_keys(
                normalize_core(ray.data.read_parquet(p),
                               batch_size=cfg.batch_size),
                cfg,
            ),
        )
        feats, fm = cache.dataset(
            files, "features", cfg_fp,
            lambda p: features_view(
                normalize(ray.data.read_parquet(p), batch_size=cfg.batch_size)
            ),
        )
        features = feats.materialize()
        from ..ops.pairing import pairs_from_keys

        pairs_raw = pairs_from_keys(keys.materialize(), cfg).repartition(
            max(cfg.scorer_concurrency * 4, cfg.join_partitions * 2)
        )
        cache_metrics = {"block_keys": km, "features": fm}
    else:
        corpus = ray.data.read_parquet(
            corpus_path,
            override_num_blocks=max(8, (cfg.scorer_concurrency + 1) * 2),
        )
        features = features_view(
            normalize(corpus, batch_size=cfg.batch_size)
        ).materialize()
        pairs_raw = candidate_pairs(
            normalize_core(corpus, batch_size=cfg.batch_size), cfg
        )
    pairs_all, blocking_metrics = split_metric_rows(pairs_raw, cfg)

    # drop pairs whose BOTH ends are previously-clustered ids: their edges
    # are covered by prev_star. Size-gated membership — broadcast below the
    # gate, bucketed left-join flags above it (no driver pull of a huge set).
    from ..ops.join import drop_both_member_pairs
    from ..ops.pairing import PAIRS_SCHEMA

    members = prev_star.select_columns(["id_a"]).map_batches(
        lambda t: pa.table({"member_id": t.column("id_a")}),
        batch_format="pyarrow",
    )
    pairs = drop_both_member_pairs(
        pairs_all, members, n_prev, PAIRS_SCHEMA,
        broadcast_max=cfg.incremental_broadcast_max_ids,
    ).materialize()

    n_feat = features.count()
    scores = score_pairs(pairs, features, cfg, n_features=n_feat).materialize()
    new_edges = match_edges(scores, cfg).select_columns(["id_a", "id_b"])
    all_edges = new_edges.union(prev_star).materialize()

    n_all_edges = all_edges.count()
    labels = propagate_labels(all_edges, cfg, n_edges=n_all_edges)
    assign = assignments_hex(
        assignments(features.select_columns(["file_id_u64"]), labels, cfg,
                    n_labels_ub=2 * n_all_edges)
    ).materialize()

    return ERResult(
        assignments=assign,
        edges=new_edges,
        scores=scores,
        pairs=pairs,
        features=features,
        metrics={
            "blocking": blocking_metrics,
            "incremental": {
                "prev_rows": int(n_prev),
                "pairs_scored": pairs.count(),
                **cache_metrics,
            },
        },
    )
