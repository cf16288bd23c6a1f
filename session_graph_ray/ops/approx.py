"""Approximate grouped aggregates via mergeable sketches.

``approx_count_distinct`` is the scale-path twin of the exact two-level
groupby in ``analytics.q_event_type_users``: the exact form's first level
shuffles one row per distinct (key, value) pair — at 10^12 rows with 10^9
distinct values per key, that exchange IS the job. Here every batch folds
its values into a fixed 4 KiB HyperLogLog register array per key
(``functions/sketch.py``), so the shuffle carries (num_batches x num_keys)
constant-size partials and the reduce is an element-wise max — the classic
mergeable-summary pattern (Flajolet et al. 2007). Accuracy ~1.6% (p=12),
asserted against exact counts in tests; rows-only in the driver gate (an
estimate has no SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.sketch import (
    empty_registers,
    estimate,
    hll_int_column,
)
from .util import pd_to_arrow

_REG_COL = "__hll"


def approx_count_distinct(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    out_col: str = "approx_n",
) -> "ray.data.Dataset":
    """Per ``key``: approximate count of distinct integer ``value``s."""

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(k, sort=False)
        regs = [empty_registers() for _ in uniq]
        for c in range(len(uniq)):
            hll_int_column(v[codes == c], regs[c])
        return pa.table(
            {
                key: pa.array(uniq),
                _REG_COL: pa.array([r.tobytes() for r in regs], type=pa.binary()),
            }
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        stack = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in g[_REG_COL]]
        )
        est = estimate(stack.max(axis=0))
        return pd_to_arrow(
            pd.DataFrame({key: [g[key].iloc[0]], out_col: [int(round(est))]})
        )

    return (
        ds.select_columns([key, value])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge, batch_format="pandas")
    )
