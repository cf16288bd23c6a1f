"""One-pass streaming table profiler (the first job run on any new corpus).

Per column: row count, null count, min/max, and an HLL approximate distinct
count — all from a single scan. Every per-batch partial is one constant-size
row per column (two floats, two strings, two counts, a 4 KiB HLL register
blob), so the shuffle carries ``num_batches x num_columns`` rows no matter
how many rows the table has; the final groupby folds partials with
pure element-wise kernels (min/max/sum/register-max). At 100 TB this is the
only affordable shape — an exact ``COUNT(DISTINCT)`` per column would be a
full-width shuffle per column.

Reference analog: the run-report counters and per-source verification counts
(``/root/reference/pipeline/bulk_process.py:268-289``,
``warp_to_rdf.py:127-143``) — generalized to a schema-wide profile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash64_np
from ..functions.sketch import (
    empty_registers,
    estimate,
    merge_registers,
    splitmix64,
    update_registers,
)
from .util import pd_to_arrow

_PARTIAL_SCHEMA = pa.schema(
    [
        ("col", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("min_num", pa.float64()),
        ("max_num", pa.float64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
        ("hll", pa.binary()),
    ]
)


def _col_partial(name: str, col: "pa.ChunkedArray") -> dict:
    n = len(col)
    n_null = col.null_count
    valid = col.drop_null() if n_null else col
    row = {
        "col": name,
        "n": n,
        "n_null": n_null,
        "min_num": None,
        "max_num": None,
        "min_str": None,
        "max_str": None,
    }
    regs = empty_registers()
    if len(valid):
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            if len(v):
                row["min_num"] = float(v.min())
                row["max_num"] = float(v.max())
                update_registers(regs, splitmix64(v.view(np.uint64)))
        elif pa.types.is_timestamp(col.type):
            v = valid.cast(pa.int64()).to_numpy(zero_copy_only=False)
            row["min_num"] = float(v.min())
            row["max_num"] = float(v.max())
            update_registers(regs, splitmix64(v.astype(np.uint64)))
        else:
            mm = pc.min_max(valid)
            row["min_str"] = str(mm["min"].as_py())
            row["max_str"] = str(mm["max"].as_py())
            update_registers(regs, hash64_np([str(s) for s in valid.to_pylist()]))
    row["hll"] = regs.tobytes()
    return row


def profile_table(
    ds: "ray.data.Dataset",
    columns: "list[str]",
) -> "ray.data.Dataset":
    """One row per profiled column: ``col, n, n_null, min_num, max_num,
    min_str, max_str, n_distinct_approx``. Numeric/timestamp columns fill
    the ``_num`` pair; everything else is profiled as its string form."""

    def partial(t: pa.Table) -> pa.Table:
        rows = [_col_partial(c, t.column(c)) for c in columns]
        return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)

    def merge(g: pd.DataFrame) -> pa.Table:
        regs = empty_registers()
        for b in g["hll"]:
            regs = merge_registers(regs, np.frombuffer(b, np.uint8))
        mn, mx = g["min_num"].min(), g["max_num"].max()
        ms = g["min_str"].dropna()
        xs = g["max_str"].dropna()
        return pd_to_arrow(
            pd.DataFrame(
                {
                    "col": [g["col"].iloc[0]],
                    "n": [np.int64(g["n"].sum())],
                    "n_null": [np.int64(g["n_null"].sum())],
                    "min_num": [float(mn) if pd.notna(mn) else None],
                    "max_num": [float(mx) if pd.notna(mx) else None],
                    "min_str": [ms.min() if len(ms) else None],
                    "max_str": [xs.max() if len(xs) else None],
                    "n_distinct_approx": [np.int64(round(estimate(regs)))],
                }
            )
        )

    return (
        ds.select_columns(columns)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("col")
        .map_groups(merge, batch_format="pandas")
    )
