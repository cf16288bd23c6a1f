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
