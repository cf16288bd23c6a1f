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

from ..config import ERConfig


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


def sliding_time_sum(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    val_col: str,
    window_us: int,
    schema: pa.Schema,
    out_col: str = "roll_c",
    cfg: ERConfig | None = None,
) -> "ray.data.Dataset":
    """Per key, per row: sum of ``val_col`` over the time interval
    ``[ts - window_us, ts]`` — SQL ``RANGE BETWEEN <w> PRECEDING AND
    CURRENT ROW`` frame semantics, peers (equal timestamps) included on
    both ends. All input columns ride through; ``out_col`` (int64) is
    appended. ``schema`` is the INPUT schema (pins empty partitions).

    Shape: one bucketed exchange on ``key % B``, then a per-partition
    kernel that is one lexsort + one cumsum + two ``searchsorted`` calls —
    no per-row or per-key Python. Cross-key bleed inside the flat sorted
    array is prevented by rebasing each key run onto a strictly monotone
    axis with ``window + 1`` gaps between runs, so a window probe can never
    cross a run boundary. The rebase is exact int64; if the per-partition
    sum of run spans would overflow (≈ 3×10^5 key-years of microseconds per
    bucket), the kernel falls back to per-run ``searchsorted`` slices.

    ``val_col`` must be int64 (the engine's micro-unit contract — exact,
    order-independent sums); ``ts_col`` int64 or timestamp.
    """
    cfg = cfg or ERConfig()
    B = cfg.hash_buckets
    out_schema = schema.append(pa.field(out_col, pa.int64()))
    w = np.int64(window_us)

    def bucket_fn(t: pa.Table) -> np.ndarray:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        k = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = g.column(ts_col).to_numpy(zero_copy_only=False)
        t = t.view("i8") if t.dtype.kind == "M" else t.astype(np.int64)
        v = g.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((t, k))
        ks, ts, vs = k[order], t[order], v[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        spans = (ts[ends - 1] - ts[starts]).astype(np.uint64)
        total = spans.sum(dtype=np.uint64) + np.uint64(len(starts)) * (
            np.uint64(w) + np.uint64(1)
        )
        cs = np.cumsum(vs)
        if total < np.uint64(2) ** np.uint64(62):
            # rebase run r onto [base_r, base_r + span_r] with w+1 gaps:
            # strictly monotone across runs, exact within them
            base = np.zeros(len(starts), dtype=np.int64)
            base[1:] = np.cumsum(spans.astype(np.int64) + w + 1)[:-1]
            m = ts - ts[starts][run_of] + base[run_of]
            lo = np.searchsorted(m, m - w, side="left")
            hi = np.searchsorted(m, m, side="right")
        else:  # pathological span×keys volume: per-run exact slices
            lo = np.empty(len(ks), dtype=np.int64)
            hi = np.empty(len(ks), dtype=np.int64)
            for s, e in zip(starts, ends):
                seg = ts[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - w, side="left")
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        roll = cs[hi - 1] - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        out = g.take(pa.array(order))
        return out.append_column(out_col, pa.array(roll, pa.int64()))

    from .exchange import exchange_map_groups

    return exchange_map_groups(
        ds, kernel, None, B, out_schema.empty_table(), bucket_fn=bucket_fn
    )


def grouped_lag(
    ds: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    value_col: str,
    schema: pa.Schema,
    out_col: str = "prev",
    cfg: ERConfig | None = None,
) -> "ray.data.Dataset":
    """``LAG(value_col) OVER (PARTITION BY key ORDER BY order, tiebreak)``:
    appends ``out_col`` (nullable int64) holding the previous row's value
    within the key's (order, tiebreak) sequence; null on each key's first
    row. ``tiebreak_col`` unique per key makes the order total, so the
    result is deterministic. Same shape as the other window kernels: one
    bucketed exchange, one lexsort, one shift — no per-row Python.

    ``value_col`` must cast losslessly to int64 (ints, timestamps)."""
    cfg = cfg or ERConfig()
    B = cfg.hash_buckets
    out_schema = schema.append(pa.field(out_col, pa.int64()))

    def bucket_fn(t: pa.Table) -> np.ndarray:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        k = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        o = g.column(order_col).to_numpy(zero_copy_only=False)
        o = o.view("i8") if o.dtype.kind == "M" else o.astype(np.int64)
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = g.column(value_col).to_numpy(zero_copy_only=False)
        v = v.view("i8") if v.dtype.kind == "M" else v.astype(np.int64)
        order = np.lexsort((tb, o, k))
        ks, vs = k[order], v[order]
        prev = np.empty(len(vs), dtype=np.int64)
        prev[1:] = vs[:-1]
        first = np.r_[True, ks[1:] != ks[:-1]]
        out = g.take(pa.array(order))
        return out.append_column(
            out_col, pa.array(np.where(first, 0, prev), pa.int64(),
                              mask=first)
        )

    from .exchange import exchange_map_groups

    return exchange_map_groups(
        ds, kernel, None, B, out_schema.empty_table(), bucket_fn=bucket_fn
    )


def scd2_history(
    ds: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    value_col: str,
    schema: pa.Schema,
    cfg: ERConfig | None = None,
) -> "ray.data.Dataset":
    """Slowly-changing-dimension (type 2) history from an event stream:
    per key, ordered by (order, tiebreak), keep only the rows where
    ``value_col`` CHANGES (the first row always changes), and attach each
    change's validity interval — ``valid_from`` = its own order value,
    ``valid_to`` = the NEXT change's order value (null while current).
    The dimension-table-building primitive CDC pipelines run after
    ``compact.latest_per_key``: latest gives you now, this gives you when.

    Same window-kernel shape as ``grouped_lag``: one bucketed exchange on
    the key, one lexsort, shift-compare for the change mask and a
    next-kept-row shift for ``valid_to`` — no per-row Python. Values and
    order cast losslessly to int64 (ints, timestamps); output columns:
    (key, value, change_id [= tiebreak], valid_from, valid_to?).
    """
    cfg = cfg or ERConfig()
    B = cfg.hash_buckets
    out_schema = pa.schema([
        (key_col, pa.int64()), (value_col, pa.int64()),
        ("change_id", pa.int64()), ("valid_from", pa.int64()),
        ("valid_to", pa.int64()),
    ])

    def bucket_fn(t: pa.Table) -> np.ndarray:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        k = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        o = g.column(order_col).to_numpy(zero_copy_only=False)
        o = o.view("i8") if o.dtype.kind == "M" else o.astype(np.int64)
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        v = g.column(value_col).to_numpy(zero_copy_only=False)
        v = v.view("i8") if v.dtype.kind == "M" else v.astype(np.int64)
        order = np.lexsort((tb, o, k))
        k, o, tb, v = k[order], o[order], tb[order], v[order]
        first = np.r_[True, k[1:] != k[:-1]]
        changed = first | np.r_[False, v[1:] != v[:-1]]
        ck, co, ctb, cv = k[changed], o[changed], tb[changed], v[changed]
        # next change within the same key (rows are still (key, order,
        # tiebreak)-sorted after the mask)
        nxt = np.empty(len(ck), dtype=np.int64)
        nxt[:-1] = co[1:]
        open_end = np.r_[ck[1:] != ck[:-1], True]
        return pa.table({
            key_col: pa.array(ck),
            value_col: pa.array(cv),
            "change_id": pa.array(ctb),
            "valid_from": pa.array(co),
            "valid_to": pa.array(np.where(open_end, 0, nxt), pa.int64(),
                                 mask=open_end),
        })

    from .exchange import exchange_map_groups

    return exchange_map_groups(
        ds, kernel, None, B, out_schema.empty_table(), bucket_fn=bucket_fn
    )
