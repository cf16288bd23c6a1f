"""Range (interval) join — the no-equi-key temporal join family.

``ops/asof.py`` covers keyed nearest-preceding; this covers containment:
match every fact row whose timestamp falls inside an interval. With a SMALL
interval set (promo windows, incident ranges, holiday calendars — the common
case) the Ray-Data-first plan is a broadcast: ship the interval table once
via ``ray.put``, test every batch against all intervals vectorized, emit
(fact, interval-id) matches. No shuffle of the fact table at all; cost is
O(batch x W) numpy comparisons.

For LARGE interval sets ``range_join_binned`` is the scale path: both
sides time-bucket to a common grain (points to their cell, each interval
REPLICATED to every cell it overlaps, CLIPPED to that cell), then one
bucketed exchange colocates cells and the per-partition kernel is fully
vectorized — because cells are disjoint ts ranges, sorting points by raw
ts alone orders them by (cell, ts), so a single global ``searchsorted``
of the clipped replica bounds against the point array is exact with zero
per-cell or per-interval Python. A point lives in exactly one cell and an
interval's replica in that cell is clipped to it, so each match is
emitted exactly once — no dedup pass. Replication factor is
span/bin_width + 1: pick ``bin_us`` near the typical interval span.
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


def range_join_binned(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    ts_col: str,
    point_schema: pa.Schema,
    id_col: str = "win_id",
    start_col: str = "start",
    end_col: str = "end",
    out_id_col: str = "win_id",
    bin_us: int = 86_400_000_000,
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """Distributed containment join (``start <= ts < end``) for LARGE
    interval sets — both sides are Datasets, nothing is broadcast. See the
    module doc for the cell/clip/searchsorted plan. Timestamps and interval
    bounds must share the microsecond int64 timeline (timestamp[us] or
    int64). Output: every point column plus ``out_id_col`` (int64);
    empty-interval rows (start >= end) are dropped."""
    W = np.int64(bin_us)
    B = num_buckets
    out_schema = point_schema.append(pa.field(out_id_col, pa.int64()))
    pcols = list(point_schema.names)

    def _i64(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False)
        return v.view("i8") if v.dtype.kind == "M" else v.astype(np.int64)

    def tag_points(t: pa.Table) -> pa.Table:
        ts = _i64(t.column(ts_col))
        cols = {c: t.column(c) for c in pcols}
        return pa.table({
            **cols,
            "__bin": pa.array(ts // W),
            "__wid": pa.nulls(t.num_rows, pa.int64()),
            "__cs": pa.nulls(t.num_rows, pa.int64()),
            "__ce": pa.nulls(t.num_rows, pa.int64()),
        })

    def tag_intervals(t: pa.Table) -> pa.Table:
        s = _i64(t.column(start_col))
        e = _i64(t.column(end_col))
        wid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s < e
        s, e, wid = s[keep], e[keep], wid[keep]
        b0 = s // W
        nb = ((e - 1) // W - b0 + 1).astype(np.int64)
        total = int(nb.sum())
        # multi-arange: replica r of interval i lands in bin b0[i] + r
        base = np.repeat(b0, nb)
        step = np.arange(total) - np.repeat(np.cumsum(nb) - nb, nb)
        bins = base + step
        rs = np.repeat(s, nb)
        re_ = np.repeat(e, nb)
        cs = np.maximum(rs, bins * W)                # clip to the cell
        ce = np.minimum(re_, (bins + 1) * W)
        n = len(bins)
        cols = {c: pa.nulls(n, point_schema.field(c).type) for c in pcols}
        return pa.table({
            **cols,
            "__bin": pa.array(bins),
            "__wid": pa.array(np.repeat(wid, nb)),
            "__cs": pa.array(cs),
            "__ce": pa.array(ce),
        })

    def bucket_fn(t: pa.Table) -> np.ndarray:
        b = t.column("__bin").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (b % np.uint64(B)).astype(np.int64)

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        import pyarrow.compute as _pc

        is_iv = _pc.is_valid(g.column("__wid"))
        pts = g.filter(_pc.invert(is_iv))
        ivs = g.filter(is_iv)
        if pts.num_rows == 0 or ivs.num_rows == 0:
            return out_schema.empty_table()
        ts = _i64(pts.column(ts_col))
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        cs = ivs.column("__cs").to_numpy(zero_copy_only=False)
        ce = ivs.column("__ce").to_numpy(zero_copy_only=False)
        wid = ivs.column("__wid").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(ts, cs, side="left")
        hi = np.searchsorted(ts, ce, side="left")
        cnt = hi - lo
        m = cnt > 0
        lo, cnt, wid = lo[m], cnt[m], wid[m]
        total = int(cnt.sum())
        idx = (np.repeat(lo, cnt)
               + np.arange(total)
               - np.repeat(np.cumsum(cnt) - cnt, cnt))
        out = pts.select(pcols).take(pa.array(order[idx]))
        return out.append_column(
            out_id_col, pa.array(np.repeat(wid, cnt), pa.int64())
        )

    from .exchange import exchange_map_groups

    tagged = points.map_batches(
        tag_points, batch_format="pyarrow", batch_size=65536
    ).union(intervals.map_batches(
        tag_intervals, batch_format="pyarrow", batch_size=65536
    ))
    return exchange_map_groups(
        tagged, kernel, None, B, out_schema.empty_table(),
        bucket_fn=bucket_fn,
    )


def interval_overlap_binned(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_id: str = "a_id",
    right_id: str = "b_id",
    start_col: str = "start",
    end_col: str = "end",
    bin_us: int = 86_400_000_000,
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """Distributed interval x interval OVERLAP join — (a_id, b_id) for
    every pair with ``max(sa, sb) < min(ea, eb)`` (half-open overlap),
    both sides Datasets, nothing broadcast.

    Same cell-replication discipline as ``range_join_binned``: each
    interval replicates CLIPPED to every cell it covers, one exchange
    colocates cells, and because clipped replicas lie inside disjoint
    cells, replicas from different cells can never overlap — the kernel
    needs no per-cell bookkeeping. Within a partition the left replicas
    sort by clipped start; each right replica's candidates are the
    BOUNDED window ``csb - W < csa < ceb`` (clipped widths are <= W by
    construction), expanded with multi-arange algebra and filtered by the
    exact ``cea > csb`` test — near-linear in matches, no quadratic scan.
    A pair whose intersection spans several cells would match in each;
    it is emitted ONLY in the cell containing ``max(sa, sb)`` (the
    intersection's first instant, carried unclipped on every replica), so
    each pair appears exactly once with no dedup pass. Empty intervals
    (start >= end) drop."""
    W = np.int64(bin_us)
    B = num_buckets
    out_schema = pa.schema([(left_id, pa.int64()), (right_id, pa.int64())])

    def _i64(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False)
        return v.view("i8") if v.dtype.kind == "M" else v.astype(np.int64)

    def tag(side_id: str, is_left: bool):
        def f(t: pa.Table) -> pa.Table:
            s = _i64(t.column(start_col))
            e = _i64(t.column(end_col))
            iid = t.column(side_id).to_numpy(
                zero_copy_only=False).astype(np.int64)
            keep = s < e
            s, e, iid = s[keep], e[keep], iid[keep]
            b0 = s // W
            nb = ((e - 1) // W - b0 + 1).astype(np.int64)
            total = int(nb.sum())
            base = np.repeat(b0, nb)
            step = np.arange(total) - np.repeat(np.cumsum(nb) - nb, nb)
            bins = base + step
            rs, re_ = np.repeat(s, nb), np.repeat(e, nb)
            return pa.table({
                "__bin": pa.array(bins),
                "__left": pa.array(
                    np.full(total, is_left, dtype=bool)),
                "__id": pa.array(np.repeat(iid, nb)),
                "__s": pa.array(rs),                     # unclipped
                "__cs": pa.array(np.maximum(rs, bins * W)),
                "__ce": pa.array(np.minimum(re_, (bins + 1) * W)),
            })

        return f

    def bucket_fn(t: pa.Table) -> np.ndarray:
        b = t.column("__bin").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (b % np.uint64(B)).astype(np.int64)

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        import pyarrow.compute as _pc

        lm = g.column("__left")
        lt = g.filter(lm)
        rt = g.filter(_pc.invert(lm))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        la = lt.column("__id").to_numpy(zero_copy_only=False)
        ls = lt.column("__s").to_numpy(zero_copy_only=False)
        lcs = lt.column("__cs").to_numpy(zero_copy_only=False)
        lce = lt.column("__ce").to_numpy(zero_copy_only=False)
        order = np.argsort(lcs, kind="stable")
        la, ls, lcs, lce = la[order], ls[order], lcs[order], lce[order]
        rb = rt.column("__id").to_numpy(zero_copy_only=False)
        rs = rt.column("__s").to_numpy(zero_copy_only=False)
        rcs = rt.column("__cs").to_numpy(zero_copy_only=False)
        rce = rt.column("__ce").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(lcs, rcs - W, side="right")
        hi = np.searchsorted(lcs, rce, side="left")
        cnt = np.maximum(hi - lo, 0)
        total = int(cnt.sum())
        if total == 0:
            return out_schema.empty_table()
        li = (np.repeat(lo, cnt) + np.arange(total)
              - np.repeat(np.cumsum(cnt) - cnt, cnt))
        ri = np.repeat(np.arange(len(rb), dtype=np.int64), cnt)
        # exact overlap on clipped replicas + emit-once cell test
        first = np.maximum(ls[li], rs[ri])
        ok = (lce[li] > rcs[ri]) & (
            first // W == np.minimum(lcs[li], rcs[ri]) // W)
        return pa.table({
            left_id: pa.array(la[li[ok]], pa.int64()),
            right_id: pa.array(rb[ri[ok]], pa.int64()),
        })

    from .exchange import exchange_map_groups

    tagged = left.map_batches(
        tag(left_id, True), batch_format="pyarrow", batch_size=65536
    ).union(right.map_batches(
        tag(right_id, False), batch_format="pyarrow", batch_size=65536
    ))
    return exchange_map_groups(
        tagged, kernel, None, B, out_schema.empty_table(),
        bucket_fn=bucket_fn,
    )
