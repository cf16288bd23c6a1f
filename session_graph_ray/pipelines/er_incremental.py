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
in tests). Cost model: blocking re-derives keys over the full corpus (cheap,
streaming, no content shuffled) but SCORING — the expensive stage — runs only
on pairs with at least one new member, so work scales with the increment. The
100-TB refinement is caching the exploded-key census per input partition in
the checkpoint store so even the key scan is delta-only; the scoring and
clustering deltas below are already increment-sized.
"""

from __future__ import annotations

import numpy as np
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


def run_er_incremental(
    corpus_path: str,
    prev_assignments: "ray.data.Dataset",
    cfg: ERConfig | None = None,
) -> ERResult:
    """Cluster the full corpus at ``corpus_path`` given ``prev_assignments``
    (the hex assignments output of an earlier run over a SUBSET of it).
    Returns a full ERResult whose ``assignments`` equal a from-scratch run.
    """
    if cfg is None:
        from ..config import auto_config

        cfg = auto_config()

    prev_star = _prev_star_u64(prev_assignments).materialize()
    prev_ids = np.sort(
        np.concatenate(
            [
                b["id_a"]
                for b in prev_star.select_columns(["id_a"]).iter_batches(
                    batch_format="numpy"
                )
            ]
        ).astype(np.uint64)
        if prev_star.count()
        else np.array([], dtype=np.uint64)
    )
    # The old-id set is driver-held and broadcast once. It is the PREVIOUS
    # corpus's id column (8 bytes/row) — at 10^9 prev rows that is 8 GB and
    # this sorted-array form still works on a big driver; beyond that the
    # same membership test becomes a bucketed semi-join (ops/join.bucket_join
    # on id % B), trading one shuffle of (id) pairs for the broadcast.
    prev_ref = ray.put(prev_ids)

    corpus = ray.data.read_parquet(
        corpus_path, override_num_blocks=max(8, (cfg.scorer_concurrency + 1) * 2)
    )
    features = features_view(normalize(corpus, batch_size=cfg.batch_size)).materialize()

    pairs_raw = candidate_pairs(normalize_core(corpus, batch_size=cfg.batch_size), cfg)
    pairs_all, blocking_metrics = split_metric_rows(pairs_raw, cfg)

    def touching_new(t: pa.Table) -> pa.Table:
        old = ray.get(prev_ref)
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        both_old = np.isin(a, old) & np.isin(b, old)
        return t.filter(pa.array(~both_old))

    pairs = pairs_all.map_batches(touching_new, batch_format="pyarrow").materialize()

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
                "prev_rows": int(len(prev_ids)),
                "pairs_scored": pairs.count(),
            },
        },
    )
