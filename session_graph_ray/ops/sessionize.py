"""Stream-shaped operator: gap-based sessionization of an event log.

The reference's only per-session stateful grouping is in-memory dict state
per conversation (``/root/reference/pipeline/jsonl_to_rdf.py:102-103``);
here the same "order within one key only" assumption (SURVEY.md §2.11)
becomes hash-bucket the users, then ONE vectorized sort + gap-split kernel
per bucket — not one Python/pandas invocation per user (round-1's shape,
pathological at 10^8 users). Order is required only inside a bucket's sort,
never across the dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_B = 64  # user-hash buckets; each bucket processes all its users in one kernel


def _bucketed(events: "ray.data.Dataset", user_col: str, ts_col: str):
    def add_bkt(t: pa.Table) -> pa.Table:
        uid = t.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__bkt", pa.array((uid % _B).astype(np.int32))
        )

    return (
        events.select_columns([user_col, ts_col])
        .map_batches(add_bkt, batch_format="pyarrow")
        .groupby("__bkt")
    )


def sessionize_counts(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> "ray.data.Dataset":
    """Per user: number of sessions (a new session starts when the gap from
    the previous event exceeds ``gap_minutes``)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col])
        uid = g[user_col].to_numpy()
        ts = g[ts_col].to_numpy()
        same_user = np.r_[False, uid[1:] == uid[:-1]]
        brk = same_user & np.r_[False, np.diff(ts) > gap]
        out = pd.DataFrame({user_col: uid, "brk": brk.astype(np.int64)})
        agg = out.groupby(user_col, as_index=False).agg(
            n_sessions=("brk", "sum"), n_events=("brk", "size")
        )
        agg["n_sessions"] = agg["n_sessions"] + 1
        from .util import pd_to_arrow

        return pd_to_arrow(agg[[user_col, "n_sessions", "n_events"]])

    return _bucketed(events, user_col, ts_col).map_groups(
        per_bucket, batch_format="pandas"
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

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col])
        uid = g[user_col].to_numpy()
        ts = g[ts_col].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user | np.r_[True, np.diff(ts) > gap]
        # per-user 0-based session id: global cumsum minus the user's offset
        sess_global = np.cumsum(brk) - 1
        user_first = np.where(new_user, sess_global, 0)
        offset = np.maximum.accumulate(user_first)
        out = pd.DataFrame(
            {
                user_col: uid,
                "session_id": (sess_global - offset).astype(np.int64),
                "ts": ts,
            }
        )
        spans = out.groupby([user_col, "session_id"], as_index=False).agg(
            start_ts=("ts", "min"), end_ts=("ts", "max"), n_events=("ts", "size")
        )
        from .util import pd_to_arrow

        return pd_to_arrow(
            spans[[user_col, "session_id", "start_ts", "end_ts", "n_events"]]
        )

    return _bucketed(events, user_col, ts_col).map_groups(
        per_bucket, batch_format="pandas"
    )
