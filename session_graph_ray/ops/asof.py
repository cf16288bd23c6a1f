"""As-of (temporal) join — a custom-operator family Ray Data lacks.

Semantics: for every left row, attach the right row with the same key whose
timestamp is the greatest one at-or-before the left timestamp (SQL
``ASOF LEFT JOIN`` / pandas ``merge_asof(direction="backward")``). The
reference's analog is provenance time-alignment — each message/tool-result is
attributed to the newest session state preceding it
(``/root/reference/pipeline/jsonl_to_rdf.py:165-208`` joins tool results to
their originating call by id+order).

Ray-Data decomposition (no global sort): both sides are hash-bucketed on the
join key — the same union + ``groupby(bucket)`` exchange as
``ops.join.bucket_join`` — and each bucket is resolved with one vectorized
``pd.merge_asof`` (C merge over the two bucket-local ts-sorted frames).

Partitioning assumption: one bucket's rows (both sides) fit in a worker.
Buckets are hash-spread over keys, so this holds unless a SINGLE key is hot;
a hot key would additionally need ts-range chunking of the left side with the
right side's last-row-per-chunk carried forward (not needed for our corpus,
same caveat family as stages/blocking's salted chunks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .util import pd_to_arrow


def asof_join_backward(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_out: dict[str, str],
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    num_buckets: int | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    right_tiebreak: str | None = None,
    allow_exact_matches: bool = True,
) -> "ray.data.Dataset":
    """Left as-of join; unmatched left rows keep nulls.

    ``direction`` is pandas merge_asof's: "backward" (latest right row at
    or before the left ts — the default and the classic ASOF), "forward"
    (earliest at or after), or "nearest". ``tolerance`` bounds the match
    distance in the ts column's native units (microseconds for
    timestamps). ``right_tiebreak`` makes equal-(key, ts) right rows
    deterministic: the right side sorts by (ts, tiebreak) — still
    ts-sorted as merge_asof requires, but duplicate timestamps resolve by
    the tiebreak instead of arrival order (which would vary with
    partitioning).

    ``right_out`` maps right-side columns to their output names (the right
    key/ts columns are dropped unless listed). Keys must be integers and
    timestamps non-null (merge_asof contract). Schemas are passed explicitly
    for the same reason as ``bucket_join``: ``.schema()`` on a lazy lineage
    executes it.
    """
    from .join import join_partition_count

    B = num_buckets or join_partition_count() * 4
    lcols = list(left_schema.names)
    rcols = [right_key, right_ts, *[c for c in right_out if c not in (right_key, right_ts)]]
    if set(lcols) & set(rcols):
        raise ValueError(f"asof_join requires disjoint column names; got {set(lcols) & set(rcols)}")
    rtypes = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    ltypes = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols]
        + [(o, rtypes[c]) for c, o in right_out.items()]
    )
    pad_cols = [c for c in rcols if c not in lcols]

    def tag(side: int, key: str, own: list[str], other: list[str], other_t):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {c: t.column(c) for c in own}
            for c in other:
                cols[c] = pa.nulls(n, other_t[c])
            k = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
            cols["__bkt"] = pa.array((k % np.uint64(B)).astype(np.int32))
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table({c: cols[c] for c in [*lcols, *pad_cols, "__bkt", "__side"]})

        return f

    l2 = left.map_batches(
        tag(0, left_key, lcols, pad_cols, rtypes), batch_format="pyarrow"
    )
    r2 = right.select_columns(rcols).map_batches(
        tag(1, right_key, rcols, [c for c in lcols if c not in rcols], ltypes),
        batch_format="pyarrow",
    )

    out_names = [*lcols, *right_out.values()]

    def coerce(df: pd.DataFrame, types: dict) -> pd.DataFrame:
        # union blocks null-pad the other side's columns, widening this
        # side's ints to float64 when the bucket holds any other-side rows;
        # the slice itself is null-free, so narrowing back is lossless
        for c in df.columns:
            t = types[c]
            if pa.types.is_integer(t) and df[c].dtype != np.int64:
                df[c] = df[c].astype("int64")
            elif pa.types.is_timestamp(t):
                df[c] = df[c].astype("datetime64[us]")
        return df

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        lg = coerce(g[g["__side"] == 0][lcols].copy(), ltypes)
        rg = coerce(g[g["__side"] == 1][rcols].copy(), rtypes)
        if lg.empty:
            return out_schema.empty_table()
        if rg.empty:
            out = lg
            for c, o in right_out.items():
                out[o] = pd.Series([pd.NA] * len(out), dtype="object")
        else:
            rsort = ([right_ts, right_tiebreak] if right_tiebreak
                     else [right_ts])
            tol = None
            if tolerance is not None:
                tol = (pd.Timedelta(microseconds=tolerance)
                       if str(lg[left_ts].dtype).startswith("datetime")
                       else tolerance)
            out = pd.merge_asof(
                lg.sort_values(left_ts, kind="stable"),
                rg.sort_values(rsort, kind="stable"),
                left_on=left_ts,
                right_on=right_ts,
                left_by=left_key,
                right_by=right_key,
                direction=direction,
                tolerance=tol,
                allow_exact_matches=allow_exact_matches,
                suffixes=("", "__r"),
            ).rename(columns=dict(right_out))
        return pd_to_arrow(out[out_names]).cast(out_schema)

    return (
        l2.union(r2)
        .groupby("__bkt")
        .map_groups(merge_bucket, batch_format="pandas")
    )
