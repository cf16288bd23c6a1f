"""The flagship three-stage record-linkage pipeline (SURVEY.md §7).

    read_parquet(corpus)
      -> normalize            (map_batches, Arrow, stateless)
      -> candidate_pairs      (key explosion -> ONE bucketed groupby fusing
                               census/prune/skew-chunking/pair-gen -> int
                               bucketed cross-key dedup; truncation counted)
      -> score_pairs          (indexed scorer actor pool over the plasma-
                               shared feature table; sha short-circuit path)
      -> match_edges          (score >= threshold)
      -> propagate_labels     (iterative int-bucketed min-label union-find)
      -> assignments          (left join: every row gets a canonical id)

Every stage optionally checkpoints through ``CheckpointManager`` (per-stage
fingerprint = input files + config), so a killed run resumes at the first
incomplete stage — the reference's watermark semantics
(``/root/reference/pipeline/bulk_process.py:83-99``) at stage/partition grain.
"""

from __future__ import annotations

import glob
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count

from ..config import ERConfig
from ..ops.pairing import split_metric_rows
from ..stages.blocking import candidate_pairs
from ..stages.clustering import assignments, assignments_hex, propagate_labels
from ..stages.normalize import features_view, normalize, normalize_core
from ..stages.scoring import match_edges, score_pairs
from ..state.checkpoint import CheckpointManager, input_fingerprint

STAGE_ORDER = ["features", "pairs", "scores", "edges", "labels", "assignments"]


@dataclass
class ERResult:
    assignments: "ray.data.Dataset"
    edges: "ray.data.Dataset"
    scores: "ray.data.Dataset"
    pairs: "ray.data.Dataset"
    features: "ray.data.Dataset"
    metrics: dict


def _cfg_fingerprint_extra(cfg: ERConfig) -> str:
    # semantic fields only: stage outputs are invariant to execution knobs
    # (pool sizes, partition counts, gates), so a checkpointed run resumes —
    # and the feature spill is reused — across cluster-size changes
    return cfg.semantic_repr()


def run_er_pipeline(
    corpus_path: str,
    cfg: ERConfig | None = None,
    checkpoint_dir: str | None = None,
) -> ERResult:
    if cfg is None:
        from ..config import auto_config

        cfg = auto_config()
    paths = sorted(glob.glob(corpus_path)) if any(
        ch in corpus_path for ch in "*?["
    ) else [corpus_path]
    fp = input_fingerprint(paths, _cfg_fingerprint_extra(cfg))
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    metrics: dict = {}

    import os
    import time

    trace = bool(os.environ.get("SGR_TRACE"))

    def stage(name: str, build):
        """Compute-or-load with lineage truncation at each stage boundary.

        With a checkpoint dir, outputs land in per-partition Parquet and are
        re-read (resume path). Without one, outputs are materialized in the
        object store — stage outputs here are compact (ids, keys, scores,
        labels; never ``content``), so pinning them avoids re-executing the
        whole upstream lineage every time a downstream consumer runs.
        """
        t0 = time.time()
        if ckpt is not None and ckpt.is_done(name, fp):
            metrics[name] = {"resumed": True}
            return ckpt.load(name)
        ds = build()
        if ckpt is not None:
            ds = ckpt.save(name, ds, fp)
            metrics[name] = {"resumed": False, "rows": ckpt.manifest["stages"][name]["rows"]}
        else:
            ds = ds.materialize()
        if trace:
            print(f"[er] stage {name}: {time.time() - t0:.2f}s", flush=True)
        return ds

    # Block-count discipline: Ray's sort-shuffle cost scales with
    # (input blocks x reduce partitions), and every downstream operator
    # inherits the read's block count. ~2 blocks per CPU balances shuffle
    # overhead (a groupby over 100 blocks costs 4x one over 32 at identical
    # row counts) against straggler packing (1 block per CPU leaves cores
    # idle behind the slowest task).
    corpus = ray.data.read_parquet(
        paths, override_num_blocks=max(8, (cfg.scorer_concurrency + 1) * 2)
    )

    features = stage(
        "features", lambda: features_view(normalize(corpus, batch_size=cfg.batch_size))
    )

    # row count for the indexed-vs-join decision comes from the manifest /
    # materialized metadata — NOT a lineage re-execution (round-1 finding)
    if ckpt is not None and "rows" in metrics.get("features", {}):
        n_feat = metrics["features"]["rows"]
    else:
        n_feat = features.count()

    # kick off the consolidated-feature spill NOW (a single concat+sort+
    # write task): it depends only on the features stage, so it runs hidden
    # behind the whole blocking stage instead of serializing in front of
    # the scorers (measured 16-22s of pure added wall at every CPU count)
    feat_path_ref = None
    if n_feat <= cfg.feature_broadcast_limit and not (
        ckpt is not None and ckpt.is_done("scores", fp)
    ):
        from ..stages.scoring import consolidate_features_async

        feat_path_ref = consolidate_features_async(features, cfg, spill_key=fp)

    pairs_raw = stage("pairs", lambda: candidate_pairs(
        # blocking needs content for shingling, but only the cheap core
        # normalization: re-derive from corpus (streaming; never materializes
        # content) instead of joining it back against the features table
        normalize_core(corpus, batch_size=cfg.batch_size), cfg
    ))
    pairs, blocking_metrics = split_metric_rows(pairs_raw, cfg)
    metrics["blocking"] = blocking_metrics
    if ckpt is not None:
        # truncation counters land in the manifest next to the stage's
        # partition inventory (the "no silent caps" rule — SURVEY.md §7.4)
        ckpt.annotate("pairs", blocking_metrics)

    # spill_key = the run fingerprint: a re-run over the same inputs + config
    # reuses the consolidated-feature spill file instead of rewriting it
    scores = stage("scores", lambda: score_pairs(
        pairs, features, cfg, n_features=n_feat, spill_key=fp,
        feat_path_ref=feat_path_ref))
    edges = stage("edges", lambda: match_edges(scores, cfg))
    if ckpt is not None and "rows" in metrics.get("edges", {}):
        n_edges = metrics["edges"]["rows"]
    else:
        n_edges = edges.count()  # metadata-only on the materialized stage
    labels = stage("labels", lambda: propagate_labels(edges, cfg, n_edges=n_edges))
    assign = stage(
        "assignments",
        lambda: assignments_hex(
            assignments(features.select_columns(["file_id_u64"]), labels, cfg,
                        n_labels_ub=2 * n_edges)
        ),
    )

    if ckpt is not None:
        metrics["stages"] = ckpt.stage_metrics()
    return ERResult(
        assignments=assign,
        edges=edges,
        scores=scores,
        pairs=pairs,
        features=features,
        metrics=metrics,
    )


def match_metrics(result: ERResult) -> dict:
    """Run-summary counters (reference analog: linked/unlinked/low-conf
    tallies, ``/root/reference/pipeline/link_entities.py:760-786``)."""
    n_pairs = result.pairs.count()
    n_edges = result.edges.count()
    n_rows = result.features.count()
    clusters = (
        result.assignments.groupby("canonical_file_id")
        .aggregate(Count(alias_name="sz"))
    )
    multi = clusters.map_batches(
        lambda t: t.filter(pc.greater(t["sz"], pa.scalar(1))),
        batch_format="pyarrow",
    ).count()
    return {
        "rows": n_rows,
        "candidate_pairs": n_pairs,
        "match_edges": n_edges,
        "match_rate": (n_edges / n_pairs) if n_pairs else 0.0,
        "multi_clusters": multi,
        **{f"blocking_{k}": v for k, v in result.metrics.get("blocking", {}).items()},
    }
