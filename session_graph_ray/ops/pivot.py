"""Pivot (long -> wide conditional aggregation).

The reference's report surface pivots implicitly — per-platform /
per-predicate count tables in ``/root/reference/scripts/graph_stats.py`` are
rows of ``(category, count)`` re-shaped by the report template. Here it is a
first-class wide-aggregate: one output column per category value.

Ray-Data shape: the category domain must be a known, small vocabulary (pass
it in; discovering it is one tiny ``groupby(pivot_col).count()``). Each batch
pre-aggregates into a (index x categories) partial frame — vectorized pandas
``pivot_table`` — so the only shuffle carries ``rows_per_index_key x
(categories + 2)`` partials, never the fact rows. This is the
pre-aggregate-before-shuffle rule applied to the wide layout.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from .util import pd_to_arrow


def pivot_sum(
    ds: "ray.data.Dataset",
    index_col: str,
    pivot_col: str,
    value_col: str,
    categories: list[str],
    suffix: str = "_c",
    count_col: str = "n",
) -> "ray.data.Dataset":
    """Wide sum-pivot: one ``<category><suffix>`` int64 sum column per
    category plus a total row count, grouped by ``index_col``. Rows whose
    category is outside ``categories`` still count toward ``count_col``."""
    from ray.data.aggregate import Sum

    out_cols = [f"{c}{suffix}" for c in categories]

    def partial(df: pd.DataFrame):
        wide = pd.pivot_table(
            df, index=index_col, columns=pivot_col, values=value_col,
            aggfunc="sum", fill_value=0,
        ).reindex(columns=categories, fill_value=0)
        wide.columns = out_cols
        wide[count_col] = df.groupby(index_col, sort=False, observed=True).size()
        return pd_to_arrow(wide.reset_index())

    return (
        ds.select_columns([index_col, pivot_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(index_col)
        .aggregate(
            *[Sum(c, alias_name=c) for c in out_cols],
            Sum(count_col, alias_name=count_col),
        )
    )


def unpivot(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    labels: list[str] | None = None,
) -> "ray.data.Dataset":
    """Wide -> long melt (the pivot's inverse): each input row becomes
    ``len(value_cols)`` rows of ``(*id_cols, label, value)``. A pure
    per-batch reshape — no shuffle, no state; each batch's output is
    ``len(value_cols)`` zero-copy-concatenated column slices, never a
    per-row loop. ``labels`` (default: the column names) are the values
    written to ``var_name``."""
    import numpy as np
    import pyarrow as pa

    labels = labels if labels is not None else list(value_cols)
    if len(labels) != len(value_cols):
        raise ValueError("labels and value_cols must align")

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = {c: pa.concat_arrays(
            [t.column(c).combine_chunks()] * len(value_cols)
        ) for c in id_cols}
        # label-major layout throughout: ids/vals are whole-column slices
        # concatenated per label, so var is each label repeated n times
        var = pa.array(np.repeat(np.asarray(labels, dtype=object), n),
                       pa.string())
        vals = pa.concat_arrays(
            [t.column(c).combine_chunks().cast(pa.int64())
             for c in value_cols]
        )
        return pa.table({**ids, var_name: var, value_name: vals})

    return ds.map_batches(melt, batch_format="pyarrow")
