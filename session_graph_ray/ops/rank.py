"""Distributed order statistics: grouped discrete quantiles and window-rank
ntile — operator families the reference exposes through its SPARQL report
surface only implicitly (hub ranking, `ORDER BY + LIMIT` reports,
``/root/reference/scripts/graph_stats.py`` percentile summaries) and that a
training-data pipeline needs first-class (length/quality deciles for
curriculum buckets, per-source score cutoffs).

Both operators avoid shuffling the fact table:

- ``grouped_quantile_disc`` value-compresses first — the only exchange
  carries ``(key, value, count)`` for DISTINCT values (bounded by the value
  domain, not the row count), then one tiny per-key vectorized CDF pick.
- ``partitioned_ntile`` computes exact per-partition tile boundaries by
  radix/histogram selection (two cheap scans + one bounded exchange of
  ``(part, bin, count)``), broadcasts the boundary tuples, and assigns tiles
  with a vectorized ``searchsorted`` map — NO global sort, NO shuffle of the
  input at any point. This is the 100-TB form of ``ntile() OVER (PARTITION BY
  p ORDER BY v, id)``: a range-partitioned sort would move every byte;
  boundaries move kilobytes.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .util import pd_to_arrow

_NBINS = 4096


def grouped_quantile_disc(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    qs: dict[str, float],
) -> "ray.data.Dataset":
    """Exact discrete quantiles per group: for each q, the value whose rank
    (1-based, ascending) is ``ceil(q * n)`` — an actual element, never an
    interpolation. ``qs`` maps output column name -> q in (0, 1].

    Scale shape: ``groupby(key, value).count()`` compresses to distinct
    values before anything is ordered, so the shuffle volume is the value
    domain's cardinality; the per-key CDF pick is O(distinct log distinct).
    """
    out_names = list(qs)
    q_arr = np.array([qs[n] for n in out_names])

    def per_key(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(value, kind="stable")
        cum = g["count()"].to_numpy().cumsum()
        n = cum[-1]
        targets = np.ceil(q_arr * n)
        idx = np.searchsorted(cum, targets, side="left")
        vals = g[value].to_numpy()[idx]
        out = {key: [g[key].iloc[0]]}
        for name, v in zip(out_names, vals):
            out[name] = [v]
        return pd_to_arrow(pd.DataFrame(out))

    return (
        ds.select_columns([key, value])
        .groupby([key, value])
        .count()
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def grouped_mode(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    out_value: str = "mode",
    out_count: str = "cnt",
    num_buckets: int = 256,
    value_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """Exact mode per group: the most frequent ``value`` for each ``key``,
    ties broken by the lexicographically smallest value (a deterministic
    total order — the same contract as SQL ``row_number() OVER (PARTITION BY
    key ORDER BY count(*) DESC, value ASC) = 1``).

    Scale shape: per-batch Arrow ``group_by(key, value).count`` compresses
    the stream to partial ``(key, value, cnt)`` triples BEFORE any exchange
    (the pre-aggregation-before-shuffle rule — shuffle volume is bounded by
    distinct pairs per batch, not rows), then one bucketed exchange on
    ``key % B`` whose kernel re-combines counts and picks the per-key-run
    argmax with one lexsort — no per-key Python.

    ``key`` must be integer-typed; ``value`` string or integer.
    ``value_type`` pins the output value type without a ``.schema()``
    introspection call (which would execute the input lineage).
    """
    B = num_buckets
    vtype = value_type or pa.string()

    def partial(t: pa.Table) -> pa.Table:
        c = (
            t.select([key, value])
            .group_by([key, value])
            .aggregate([([], "count_all")])
        )
        return c.rename_columns([key, value, "cnt"])

    def bucket_fn(t: pa.Table) -> np.ndarray:
        k = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        c = g.group_by([key, value]).aggregate([("cnt", "sum")])
        k = c.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = c.column("cnt_sum").to_numpy(zero_copy_only=False)
        vals = c.column(value)
        # value codes in lexical order: np.unique sorts, so code order ==
        # value order and the lexsort tiebreak is exact
        varr = vals.to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(varr, return_inverse=True)
        order = np.lexsort((codes, -cnt, k))
        ks = k[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        pick = order[starts]
        return pa.table(
            {
                key: pa.array(k[pick], pa.int64()),
                out_value: vals.take(pa.array(pick)),
                out_count: pa.array(cnt[pick].astype(np.int64)),
            }
        )

    from .exchange import exchange_map_groups

    partials = ds.select_columns([key, value]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    empty = pa.schema(
        [(key, pa.int64()), (out_value, vtype), (out_count, pa.int64())]
    ).empty_table()
    return exchange_map_groups(partials, kernel, None, B, empty, bucket_fn=bucket_fn)


def _ntile_of_rank(ranks: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL ntile(k): first ``n % k`` tiles get ``n//k + 1`` rows."""
    size_small = n // k
    big = n % k
    cut = big * (size_small + 1)
    lo = (ranks - 1) // (size_small + 1) + 1
    if size_small == 0:
        return lo
    hi = big + (ranks - 1 - cut) // size_small + 1
    return np.where(ranks <= cut, lo, hi)


def _encode_u(order: np.ndarray, tiebreak: np.ndarray) -> np.ndarray:
    """Strict-total-order composite key (order, tiebreak) -> uint64.
    Requires 0 <= order < 2^31 and 0 <= tiebreak < 2^32 (asserted upstream)."""
    return (order.astype(np.uint64) << np.uint64(32)) | tiebreak.astype(np.uint64)


def partitioned_ntile(
    ds: "ray.data.Dataset",
    part: str,
    order: str,
    tiebreak: str,
    n_tiles: int,
    out_col: str = "tile",
) -> "ray.data.Dataset":
    """``ntile(n_tiles) OVER (PARTITION BY part ORDER BY order, tiebreak)``
    for integer order/tiebreak columns with a unique (part, order, tiebreak)
    total order (unique tiebreak suffices).

    Three scans, zero input shuffle:
      1. histogram: per-batch partial counts of a monotone 4096-binning of
         the composite key, reduced via ``groupby(part, bin).sum`` (bounded:
         parts x 4096 rows reach the driver);
      2. boundary resolution: rows whose (part, bin) holds a tile boundary
         are the only values collected (~n/4096 per boundary; a hot single
         (order, tiebreak-range) bin would need one recursive refinement
         round — not needed at our scales, documented here);
      3. assignment: broadcast boundary arrays, vectorized searchsorted.
    """
    from ray.data.aggregate import Max, Min, Sum

    sel = ds.select_columns([part, order, tiebreak])
    mm = sel.aggregate(Min(order), Max(order), Min(tiebreak), Max(tiebreak))
    o_lo, o_hi = mm[f"min({order})"], mm[f"max({order})"]
    t_lo, t_hi = mm[f"min({tiebreak})"], mm[f"max({tiebreak})"]
    if o_lo < 0 or o_hi >= 2**31 or t_lo < 0 or t_hi >= 2**32:
        raise ValueError("partitioned_ntile requires 0<=order<2^31, 0<=tiebreak<2^32")
    # monotone (non-strict) float binning over the composite-key range:
    # float64 rounding may merge adjacent u's into one bin but never reorders
    f_lo = float(o_lo) * 2.0**32
    f_hi = float(o_hi + 1) * 2.0**32

    def to_bin(u: np.ndarray) -> np.ndarray:
        b = ((u.astype(np.float64) - f_lo) * (_NBINS / max(f_hi - f_lo, 1.0))).astype(
            np.int64
        )
        return np.clip(b, 0, _NBINS - 1)

    def hist(t: pa.Table) -> pa.Table:
        u = _encode_u(
            t.column(order).to_numpy(zero_copy_only=False),
            t.column(tiebreak).to_numpy(zero_copy_only=False),
        )
        df = pd.DataFrame({part: t.column(part).to_numpy(zero_copy_only=False),
                           "__bin": to_bin(u)})
        c = df.groupby([part, "__bin"], sort=False, observed=True).size()
        c = c.rename("cnt").reset_index()
        return pd_to_arrow(c)

    bins = (
        sel.map_batches(hist, batch_format="pyarrow")
        .groupby([part, "__bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )

    # driver: per part, locate each tile boundary's bin + residual rank
    boundary_bins: dict = {}  # (part, bin) -> list of residual ranks
    part_meta: dict = {}  # part -> (n, [boundary ranks])
    for p, grp in bins.groupby(part, sort=False):
        grp = grp.sort_values("__bin")
        cnts = grp["cnt"].to_numpy()
        bvals = grp["__bin"].to_numpy()
        cum = cnts.cumsum()
        n = int(cum[-1])
        size_small, big = divmod(n, n_tiles)
        bounds = [
            i * (size_small + 1) if i <= big else big + i * size_small
            for i in range(1, n_tiles)
        ]
        bounds = [min(b, n) for b in bounds]
        part_meta[p] = (n, bounds)
        prev = np.concatenate([[0], cum[:-1]])
        for r in bounds:
            j = int(np.searchsorted(cum, r, side="left"))
            boundary_bins.setdefault((p, int(bvals[j])), []).append(r - int(prev[j]))

    bb_by_part: dict = {}
    for p, bi in boundary_bins:
        bb_by_part.setdefault(p, []).append(bi)
    bb_ref = ray.put({p: np.array(sorted(v)) for p, v in bb_by_part.items()})
    _EMPTY = np.array([], dtype=np.int64)

    def boundary_rows(t: pa.Table) -> pa.Table:
        keys = ray.get(bb_ref)
        pv = t.column(part).to_numpy(zero_copy_only=False)
        u = _encode_u(
            t.column(order).to_numpy(zero_copy_only=False),
            t.column(tiebreak).to_numpy(zero_copy_only=False),
        )
        b = to_bin(u)
        mask = np.zeros(len(pv), dtype=bool)
        for p in pd.unique(pv):
            m = pv == p
            mask[m] = np.isin(b[m], keys.get(p, _EMPTY))
        return pa.table(
            {part: pa.array(pv[mask]), "__bin": pa.array(b[mask]),
             "__u": pa.array(u[mask])}
        )

    cand = sel.map_batches(boundary_rows, batch_format="pyarrow").to_pandas()

    boundaries: dict = {p: [] for p in part_meta}  # part -> boundary u values
    for (p, bi), residuals in boundary_bins.items():
        us = np.sort(cand[(cand[part] == p) & (cand["__bin"] == bi)]["__u"].to_numpy())
        for r in residuals:
            boundaries.setdefault(p, []).append(us[r - 1])
    bnd_ref = ray.put({p: np.sort(np.array(v, np.uint64)) for p, v in boundaries.items()})

    def assign(t: pa.Table) -> pa.Table:
        bnd = ray.get(bnd_ref)
        pv = t.column(part).to_numpy(zero_copy_only=False)
        u = _encode_u(
            t.column(order).to_numpy(zero_copy_only=False),
            t.column(tiebreak).to_numpy(zero_copy_only=False),
        )
        tile = np.ones(len(pv), dtype=np.int64)
        for p in pd.unique(pv):
            m = pv == p
            tile[m] = np.searchsorted(bnd[p], u[m], side="left") + 1
        return t.append_column(out_col, pa.array(tile))

    return sel.map_batches(assign, batch_format="pyarrow")


def grouped_mad_outliers(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    k_mad: int = 5,
) -> "ray.data.Dataset":
    """Robust per-group outlier stats via median/MAD (the data-cleaning
    filter that survives the heavy tails a mean/stddev gate drowns in):
    per key, the exact discrete median (rank ceil(n/2)), the MAD
    (discrete median of |v - median|), and the count of rows deviating
    more than ``k_mad`` x MAD. Integer-exact end to end — both medians
    come from :func:`grouped_quantile_disc`'s compressed-CDF rank pick,
    so the oracle reproduces them with a row_number selection.

    Three passes over the value column (median, MAD, flag) with
    constant-size key tables broadcast between them — at 100 TB each
    pass is one pruned scan; nothing but (key, distinct-value) rows ever
    shuffles. Output: (key, median, mad, n_rows, n_outliers)."""
    import ray

    med_df = grouped_quantile_disc(ds, key, value, {"med": 0.5}).to_pandas()
    med_of = dict(zip(med_df[key], med_df["med"]))
    med_ref = ray.put(med_of)

    def dev(t: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False)
        meds = np.array([m[x] for x in np.unique(kv)], dtype=np.int64)
        _, inv = np.unique(kv, return_inverse=True)
        return pa.table({key: t.column(key),
                         "dev": pa.array(np.abs(v - meds[inv]))})

    devs = ds.select_columns([key, value]).map_batches(
        dev, batch_format="pyarrow", batch_size=65536)
    mad_df = grouped_quantile_disc(devs, key, "dev",
                                   {"mad": 0.5}).to_pandas()
    mad_of = dict(zip(mad_df[key], mad_df["mad"]))
    both_ref = ray.put((med_of, mad_of))

    def flag(t: pa.Table) -> pa.Table:
        m, d = ray.get(both_ref)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(kv, return_inverse=True)
        meds = np.array([m[x] for x in uk], dtype=np.int64)
        mads = np.array([d[x] for x in uk], dtype=np.int64)
        out = np.abs(v - meds[inv]) > k_mad * mads[inv]
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        no = np.bincount(inv, weights=out, minlength=len(uk)).astype(
            np.int64)
        return pa.table({key: pa.array(uk), "n_rows": pa.array(n),
                         "n_outliers": pa.array(no)})

    from ray.data.aggregate import Sum

    agg = (ds.select_columns([key, value])
           .map_batches(flag, batch_format="pyarrow", batch_size=65536)
           .groupby(key)
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Sum("n_outliers", alias_name="n_outliers")))

    def finish(t: pa.Table) -> pa.Table:
        kv = t.column(key).to_numpy(zero_copy_only=False)
        return pa.table({
            key: t.column(key),
            "median": pa.array(
                np.array([med_of[x] for x in kv], dtype=np.int64)),
            "mad": pa.array(
                np.array([mad_of[x] for x in kv], dtype=np.int64)),
            "n_rows": t.column("n_rows"),
            "n_outliers": t.column("n_outliers"),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort(key)
