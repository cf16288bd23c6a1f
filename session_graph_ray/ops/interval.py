"""Range (interval) join — the no-equi-key temporal join family.

``ops/asof.py`` covers keyed nearest-preceding; this covers containment:
match every fact row whose timestamp falls inside an interval. With a SMALL
interval set (promo windows, incident ranges, holiday calendars — the common
case) the Ray-Data-first plan is a broadcast: ship the interval table once
via ``ray.put``, test every batch against all intervals vectorized, emit
(fact, interval-id) matches. No shuffle of the fact table at all; cost is
O(batch x W) numpy comparisons. For LARGE interval sets the scale path is
time-bucketing both sides to a common grain and equi-joining on the bucket
(each interval replicated to the buckets it spans) — the standard
partitioned interval-join decomposition; not needed for our workloads and
documented here for parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def range_join_broadcast(
    ds: "ray.data.Dataset",
    ts_col: str,
    intervals: pd.DataFrame,
    id_col: str = "win_id",
    start_col: str = "start",
    end_col: str = "end",
    out_id_col: str = "win_id",
) -> "ray.data.Dataset":
    """Inner containment join: one output row per (fact row, interval) with
    ``start <= ts < end``. Overlapping intervals multiply rows (1->N).
    ``intervals`` is driver-side and broadcast once."""
    iv = intervals[[id_col, start_col, end_col]].reset_index(drop=True)
    iv_ref = ray.put(
        (
            iv[id_col].to_numpy(),
            iv[start_col].to_numpy().astype("datetime64[us]"),
            iv[end_col].to_numpy().astype("datetime64[us]"),
        )
    )

    def match(t: pa.Table) -> pa.Table:
        ids, starts, ends = ray.get(iv_ref)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype("datetime64[us]")
        pieces, id_runs = [], []
        for wid, s, e in zip(ids, starts, ends):
            mask = (ts >= s) & (ts < e)
            if mask.any():
                pieces.append(t.filter(pa.array(mask)))
                id_runs.append(np.full(int(mask.sum()), wid))
        if not pieces:
            empty = t.schema.empty_table()
            return empty.append_column(
                out_id_col, pa.array([], type=pa.from_numpy_dtype(ids.dtype))
            )
        out = pa.concat_tables(pieces)
        return out.append_column(out_id_col, pa.array(np.concatenate(id_runs)))

    return ds.map_batches(match, batch_format="pyarrow")
