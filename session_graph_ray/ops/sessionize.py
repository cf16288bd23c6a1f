"""Stream-shaped operator: gap-based sessionization of an event log.

The reference's only per-session stateful grouping is in-memory dict state
per conversation (``/root/reference/pipeline/jsonl_to_rdf.py:102-103``);
here the same "order within one key only" assumption (SURVEY.md §2.11)
becomes ``groupby(user).map_groups(sort + gap-split)`` — order is required
only inside a group, never across the dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def sessionize_counts(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> "ray.data.Dataset":
    """Per user: number of sessions (a new session starts when the gap from
    the previous event exceeds ``gap_minutes``)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].sort_values().to_numpy()
        breaks = int((np.diff(ts) > gap).sum()) if len(ts) > 1 else 0
        return pd.DataFrame(
            {user_col: [g[user_col].iloc[0]], "n_sessions": np.int64(breaks + 1),
             "n_events": np.int64(len(ts))}
        )

    return events.select_columns([user_col, ts_col]).groupby(user_col).map_groups(
        per_user, batch_format="pandas"
    )


def session_spans(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> "ray.data.Dataset":
    """Per (user, session): start ts, end ts, event count. Session ids are
    deterministic per user (0-based in ts order)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].to_numpy()
        new_sess = np.concatenate([[0], (np.diff(ts) > gap).astype(np.int64)])
        sess_id = np.cumsum(new_sess)
        out = g.assign(session_id=sess_id).groupby("session_id").agg(
            start_ts=(ts_col, "min"), end_ts=(ts_col, "max"),
            n_events=(ts_col, "size"),
        ).reset_index()
        out[user_col] = g[user_col].iloc[0]
        return out[[user_col, "session_id", "start_ts", "end_ts", "n_events"]]

    return events.select_columns([user_col, ts_col]).groupby(user_col).map_groups(
        per_user, batch_format="pandas"
    )
