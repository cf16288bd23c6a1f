"""Windowed aggregates over keyed event streams (custom-operator family:
"windowed aggregate" from the training-data-pipeline extension list).

Tumbling calendar windows are plain grouped aggregates
(``pipelines/analytics.q_events_daily``). Sliding windows decompose the
Ray-Data way: first the tumbling aggregate (one shuffle carrying only
(key, window, partials) — the pre-aggregation-before-shuffle rule), then a
per-key ordered sliding combine inside ``map_groups`` — a vectorized
cumsum-difference, never a per-row loop. The partitioning assumption: one
key's window rows fit one group (windows per key = time-range/width — small
by construction even when the raw event count is 10^12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def sliding_rows_sum(
    ds: "ray.data.Dataset",
    key: str,
    order: str,
    value: str,
    window_rows: int = 3,
    out_col: str = "sliding_sum",
) -> "ray.data.Dataset":
    """Per key, ordered by ``order``: sum of ``value`` over the current and
    the ``window_rows - 1`` preceding rows (SQL ``ROWS BETWEEN n PRECEDING
    AND CURRENT ROW`` frame semantics — gap-insensitive)."""

    def per_key(g: pd.DataFrame) -> pa.Table:
        from .util import pd_to_arrow

        g = g.sort_values(order)
        v = g[value].to_numpy()
        cs = np.cumsum(v)
        lag = np.zeros_like(cs)
        if len(v) > window_rows:
            lag[window_rows:] = cs[:-window_rows]
        out = g[[key, order]].copy()
        out[out_col] = cs - lag
        return pd_to_arrow(out)

    return (
        ds.select_columns([key, order, value])
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )
