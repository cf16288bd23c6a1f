"""Evaluation: pairwise F1 on labeled same-block pairs + cluster equality.

The metric from BASELINE.json: predicted-match = the two files share a
canonical id in the pipeline's ``assignments``; ground truth =
``labeled_pairs.is_match``; F1 over the labeled pairs (which all co-occur
under a blocking key, per FIXTURES.md §2). Target >= 0.99.

Driver-side pandas/DuckDB is fine here: labels are an O(clusters) table, not
the corpus.
"""

from __future__ import annotations

import duckdb
import pandas as pd

import ray.data


def pairwise_f1(assignments: "ray.data.Dataset", labeled_pairs_path: str) -> dict:
    assign_df = assignments.to_pandas()
    con = duckdb.connect()
    con.register("assign", assign_df)
    res = con.execute(
        f"""
        WITH lp AS (SELECT * FROM read_parquet('{labeled_pairs_path}')),
        joined AS (
          SELECT lp.is_match,
                 (a1.canonical_file_id = a2.canonical_file_id) AS pred
          FROM lp
          JOIN assign a1 ON a1.file_id = lp.file_id_a
          JOIN assign a2 ON a2.file_id = lp.file_id_b
        )
        SELECT
          SUM(CASE WHEN is_match AND pred THEN 1 ELSE 0 END)         AS tp,
          SUM(CASE WHEN NOT is_match AND pred THEN 1 ELSE 0 END)     AS fp,
          SUM(CASE WHEN is_match AND NOT pred THEN 1 ELSE 0 END)     AS fn,
          SUM(CASE WHEN NOT is_match AND NOT pred THEN 1 ELSE 0 END) AS tn,
          COUNT(*) AS n
        FROM joined
        """
    ).fetchone()
    tp, fp, fn, tn, n = (int(x or 0) for x in res)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn, "n_labeled": n,
        "precision": precision, "recall": recall, "f1": f1,
    }


def cluster_equality(assignments: "ray.data.Dataset", expected_path: str) -> dict:
    """Exact canonical-id comparison vs the planted ground-truth clusters.

    Both sides elect canonical = min(file_id) within a cluster, so when the
    pipeline recovers exactly the planted partition the ids match verbatim.
    """
    assign_df = assignments.to_pandas()
    exp = pd.read_parquet(expected_path)
    merged = exp.merge(assign_df, on="file_id", how="left",
                       suffixes=("_expected", "_pred"))
    missing = int(merged["canonical_file_id_pred"].isna().sum())
    equal = int(
        (merged["canonical_file_id_pred"] == merged["canonical_file_id_expected"]).sum()
    )
    n = len(merged)
    return {
        "rows": n,
        "missing": missing,
        "exact_equal": equal,
        "exact_equal_frac": equal / n if n else 1.0,
    }


def blocking_metrics(
    pairs: "ray.data.Dataset",
    n_records: int,
    labeled_pairs_path: str,
) -> dict:
    """Blocking-quality metrics (the standard ER evaluation pair):

    - ``reduction_ratio`` = 1 - |candidates| / C(n, 2) — how much of the
      quadratic comparison space blocking eliminated;
    - ``pair_completeness`` (a.k.a. recall of blocking) = fraction of
      labeled TRUE matches that survive as candidates.

    Caveat for THIS engine: exact-content blocks emit a STAR over the
    block min (N-1 pairs for an N-clone group), so a labeled pair between
    two non-min clones is covered TRANSITIVELY, not literally — the
    classic literal metric undercounts star-blocked recall (the tiny
    corpus measures 0.83 literal while downstream pairwise F1 is 1.0).
    Use ``pairwise_f1`` on the final assignments for transitive recall;
    this metric is the standard candidate-grain diagnostic.

    Candidates stream; only the labeled pairs (small by construction)
    and per-batch membership partials reach the driver.
    """
    import numpy as np
    import pyarrow as pa

    lab = pd.read_parquet(labeled_pairs_path)
    lab = lab[lab["is_match"]] if "is_match" in lab else lab
    x = lab.iloc[:, 0].to_numpy()
    y = lab.iloc[:, 1].to_numpy()
    if x.dtype == object:  # hex file_id strings -> the pairs' u64 space
        from .functions.hashing import hex_to_u64

        x, y = hex_to_u64(list(x)), hex_to_u64(list(y))
    a = np.minimum(x, y)
    b = np.maximum(x, y)
    # full-range u64 ids don't pack into int64 — map both sides through
    # the (small) label vocabulary first, then one np.isin on the packed
    # vocabulary INDICES (bounded by |vocab|^2, overflow-free)
    vocab = np.unique(np.concatenate([a, b]))
    V = np.int64(len(vocab))
    want_keys = np.unique(np.searchsorted(vocab, a) * V
                          + np.searchsorted(vocab, b))
    import ray

    want_ref = ray.put((vocab, want_keys, V))

    def partial(t: pa.Table) -> pa.Table:
        vc, wk, v = ray.get(want_ref)
        x = t.column(0).to_numpy(zero_copy_only=False)
        y = t.column(1).to_numpy(zero_copy_only=False)
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        il = np.searchsorted(vc, lo).clip(max=len(vc) - 1)
        ih = np.searchsorted(vc, hi).clip(max=len(vc) - 1)
        inv = (len(vc) > 0) & (vc[il] == lo) & (vc[ih] == hi)
        hit = int(np.isin(il[inv] * v + ih[inv], wk).sum())
        return pa.table({"n": pa.array([len(lo)], pa.int64()),
                         "hit": pa.array([hit], pa.int64())})

    from ray.data.aggregate import Sum

    agg = (pairs.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
           .aggregate(Sum("n", alias_name="n"),
                      Sum("hit", alias_name="hit")))
    n_cand = int(agg["n"] or 0)
    n_hit = int(agg["hit"] or 0)
    all_pairs = n_records * (n_records - 1) // 2
    n_want = len(want_keys)
    return {
        "n_candidates": n_cand,
        "n_labeled_matches": n_want,
        "reduction_ratio": 1.0 - (n_cand / all_pairs if all_pairs else 0.0),
        "pair_completeness": (n_hit / n_want) if n_want else 1.0,
    }


def threshold_sweep(
    scores: "ray.data.Dataset",
    labeled_pairs_path: str,
    id_a: str | None = None,
    id_b: str | None = None,
    score_col: str = "score",
    n_buckets: int = 1000,
) -> pd.DataFrame:
    """Precision/recall over every decision threshold — the curve you read
    BEFORE pinning ``ERConfig.match_threshold``. Scores quantize to
    ``n_buckets`` levels; each batch ships one (bucket, is_match) count
    histogram (constant-size partials), and the cumulative sweep runs
    driver-side over the tiny histogram. Labeled pairs not present in the
    candidate set count as false negatives at EVERY threshold (blocking
    misses bound recall — same caveat as ``blocking_metrics``).

    Returns a DataFrame (threshold, tp, fp, fn, precision, recall, f1)
    from the highest occupied bucket downward.
    """
    import numpy as np
    import pyarrow as pa

    import ray

    cols = scores.schema().names
    id_a = id_a or cols[0]
    id_b = id_b or cols[1]
    lab = pd.read_parquet(labeled_pairs_path)
    lab = lab[lab["is_match"]] if "is_match" in lab else lab
    x = lab.iloc[:, 0].to_numpy()
    y = lab.iloc[:, 1].to_numpy()
    if x.dtype == object:
        from .functions.hashing import hex_to_u64

        x, y = hex_to_u64(list(x)), hex_to_u64(list(y))
    vocab = np.unique(np.concatenate([x, y]))
    V = np.int64(len(vocab))
    pos_keys = np.unique(np.searchsorted(vocab, np.minimum(x, y)) * V
                         + np.searchsorted(vocab, np.maximum(x, y)))
    ref = ray.put((vocab, pos_keys, V))

    def hist(t: pa.Table) -> pa.Table:
        vc, pk, v = ray.get(ref)
        a = t.column(id_a).to_numpy(zero_copy_only=False)
        b = t.column(id_b).to_numpy(zero_copy_only=False)
        s = t.column(score_col).to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        il = np.searchsorted(vc, lo).clip(max=len(vc) - 1)
        ih = np.searchsorted(vc, hi).clip(max=len(vc) - 1)
        known = (len(vc) > 0) & (vc[il] == lo) & (vc[ih] == hi)
        is_pos = np.zeros(len(s), dtype=np.int64)
        is_pos[known] = np.isin(il[known] * v + ih[known], pk)
        bkt = np.clip((s * n_buckets).astype(np.int64), 0, n_buckets)
        pos = np.bincount(bkt, weights=is_pos,
                          minlength=n_buckets + 1).astype(np.int64)
        tot = np.bincount(bkt, minlength=n_buckets + 1).astype(np.int64)
        return pa.table({"p": pa.array([pos.tobytes()], pa.binary()),
                         "t": pa.array([tot.tobytes()], pa.binary())})

    rows = scores.map_batches(hist, batch_format="pyarrow",
                              batch_size=65536).take_all()
    pos = np.zeros(n_buckets + 1, dtype=np.int64)
    tot = np.zeros(n_buckets + 1, dtype=np.int64)
    for r in rows:
        pos += np.frombuffer(r["p"], dtype=np.int64)
        tot += np.frombuffer(r["t"], dtype=np.int64)
    n_pos_total = len(pos_keys)
    tp = np.cumsum(pos[::-1])[::-1]           # matches at or above bucket
    pred = np.cumsum(tot[::-1])[::-1]
    fp = pred - tp
    fn = n_pos_total - tp
    occupied = tot > 0
    th = np.arange(n_buckets + 1) / n_buckets
    prec = np.where(pred > 0, tp / np.maximum(pred, 1), 1.0)
    rec = np.where(n_pos_total > 0, tp / max(n_pos_total, 1), 1.0)
    f1 = np.where(prec + rec > 0, 2 * prec * rec / np.maximum(
        prec + rec, 1e-300), 0.0)
    out = pd.DataFrame({"threshold": th, "tp": tp, "fp": fp, "fn": fn,
                        "precision": prec, "recall": rec, "f1": f1})
    return out[occupied].reset_index(drop=True)
