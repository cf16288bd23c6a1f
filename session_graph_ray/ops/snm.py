"""Sorted-neighborhood blocking (SNM) — the classic windowed ER candidate
generator (Hernandez & Stolfo 1995): sort the corpus by a blocking key and
pair every record with its w-1 successors in the sorted order.

Complements the repo's hash-key blocking families (stages/blocking.py): SNM
catches near-misses that share NO exact key (adjacent-but-unequal sort keys),
the reference's "same normalized string => same node" idea
(``/root/reference/pipeline/common.py:29-36``) relaxed to neighborhoods.

Distributed shape (no driver rows, no full sort materialization):

1. ``global_rank`` — exact dense 0-based rank of every row under the strict
   total order (order_col, tiebreak_col):
     - one compact histogram pass over a monotone 4096-binning of the
       composite key (constant-size reduce: 4096 counts to the driver,
       broadcast back as exclusive prefix offsets);
     - ONE bounded exchange colocating complete bins; inside each bin the
       kernel argsorts the (unique) composite keys, so
       rank = bin_offset + local index. Bins can only MERGE adjacent keys
       (float binning is monotone, never reordering), so per-bin local
       order is globally consistent.
2. ``snm_pairs`` — each ranked row is exploded to window-buckets
   ``r // w`` (own) and ``r // w - 1`` (backfill); any pair with rank
   distance < w shares the lower member's own bucket, so generating pairs
   ONLY from own-rows whose bucket matches dedups by construction (no
   second exchange). Pair expansion is vectorized searchsorted + repeat.

Scale notes: every exchange moves (u64, i64) projections, never payload
columns; the histogram reduce is O(4096) regardless of corpus size; window
buckets hold <= 2w rows each, so kernel memory is O(w) per group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.minhash import _ranges_concat
from .exchange import exchange_map_groups

_NBINS = 4096


def _encode_u(order: np.ndarray, tiebreak: np.ndarray) -> np.ndarray:
    """Strict-total-order composite (order, tiebreak) -> uint64; requires
    0 <= order < 2^31 and 0 <= tiebreak < 2^32 (same contract as
    ops/rank.py; validated in global_rank)."""
    return (order.astype(np.uint64) << np.uint64(32)) | tiebreak.astype(
        np.uint64
    )


def global_rank(
    ds: "ray.data.Dataset",
    order_col: str,
    tiebreak_col: str,
    out_col: str = "rank",
) -> "ray.data.Dataset":
    """(order_col, tiebreak_col) -> (tiebreak_col, out_col) with the exact
    dense 0-based global rank under ORDER BY order_col, tiebreak_col.
    ``tiebreak_col`` values must be unique (they become the row identity).
    """
    from ray.data.aggregate import Max, Min

    sel = ds.select_columns([order_col, tiebreak_col]).materialize()
    mm = sel.aggregate(
        Min(order_col), Max(order_col), Min(tiebreak_col), Max(tiebreak_col)
    )
    o_lo, o_hi = mm[f"min({order_col})"], mm[f"max({order_col})"]
    t_lo, t_hi = mm[f"min({tiebreak_col})"], mm[f"max({tiebreak_col})"]
    if o_lo is None:
        return pa_empty_rank(tiebreak_col, out_col)
    if o_lo < 0 or o_hi >= 2**31 or t_lo < 0 or t_hi >= 2**32:
        raise ValueError(
            "global_rank requires 0 <= order < 2^31, 0 <= tiebreak < 2^32"
        )
    f_lo = float(o_lo) * 2.0**32
    f_hi = float(o_hi + 1) * 2.0**32

    def to_bin(u: np.ndarray) -> np.ndarray:
        b = (
            (u.astype(np.float64) - f_lo) * (_NBINS / max(f_hi - f_lo, 1.0))
        ).astype(np.int64)
        return np.clip(b, 0, _NBINS - 1)

    def hist(t: pa.Table) -> pa.Table:
        u = _encode_u(
            t.column(order_col).to_numpy(zero_copy_only=False),
            t.column(tiebreak_col).to_numpy(zero_copy_only=False),
        )
        cnt = np.bincount(to_bin(u), minlength=_NBINS)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"b": pa.array(nz, pa.int64()), "c": pa.array(cnt[nz], pa.int64())}
        )

    # constant-size reduce: <= 4096 rows regardless of corpus size
    parts = sel.map_batches(hist, batch_format="pyarrow").to_pandas()
    counts = np.zeros(_NBINS, dtype=np.int64)
    np.add.at(counts, parts["b"].to_numpy(), parts["c"].to_numpy())
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    off_ref = ray.put(offsets)

    def bucket_fn(t: pa.Table) -> np.ndarray:
        u = _encode_u(
            t.column(order_col).to_numpy(zero_copy_only=False),
            t.column(tiebreak_col).to_numpy(zero_copy_only=False),
        )
        return to_bin(u)

    empty = pa.table(
        {
            tiebreak_col: pa.array([], pa.int64()),
            out_col: pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
        u = _encode_u(
            g.column(order_col).to_numpy(zero_copy_only=False), tb
        )
        b = to_bin(u)
        idx = np.argsort(u, kind="stable")  # u unique (unique tiebreak)
        bs = b[idx]
        # local index inside each contiguous bin run of the sorted view
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        local = np.arange(bs.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, bs.size])
        )
        rank = off[bs] + local
        return pa.table(
            {
                tiebreak_col: pa.array(tb[idx].astype(np.int64), pa.int64()),
                out_col: pa.array(rank, pa.int64()),
            }
        )

    return exchange_map_groups(
        sel, kernel, None, _NBINS, empty, bucket_fn=bucket_fn
    )


def pa_empty_rank(tiebreak_col: str, out_col: str) -> "ray.data.Dataset":
    return ray.data.from_arrow(
        pa.table(
            {
                tiebreak_col: pa.array([], pa.int64()),
                out_col: pa.array([], pa.int64()),
            }
        )
    )


def snm_pairs(
    ds: "ray.data.Dataset",
    order_col: str,
    id_col: str,
    window: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
    dist_col: str = "rank_dist",
) -> "ray.data.Dataset":
    """All (a, b) pairs whose rank distance under ORDER BY (order_col,
    id_col) is 1..window-1; ``a`` is the lower-ranked row. Exactly the SQL

        WITH r AS (SELECT id, row_number() OVER (ORDER BY ord, id) rn ...)
        SELECT x.id, y.id, y.rn - x.rn FROM r x JOIN r y
        ON y.rn > x.rn AND y.rn - x.rn < window
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = global_rank(ds, order_col, id_col, out_col="__r")
    w = np.int64(window)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        r = t.column("__r").to_numpy(zero_copy_only=False)
        own_b = r // w
        back_b = own_b - 1
        keep = back_b >= 0
        return pa.table(
            {
                id_col: pa.array(
                    np.concatenate([ids, ids[keep]]), pa.int64()
                ),
                "__r": pa.array(np.concatenate([r, r[keep]]), pa.int64()),
                "__bkt": pa.array(
                    np.concatenate([own_b, back_b[keep]]), pa.int64()
                ),
                "__own": pa.array(
                    np.concatenate(
                        [np.ones(r.size, bool), np.zeros(int(keep.sum()), bool)]
                    ),
                    pa.bool_(),
                ),
            }
        )

    exploded = ranked.map_batches(explode, batch_format="pyarrow")
    empty = pa.table(
        {
            id_a: pa.array([], pa.int64()),
            id_b: pa.array([], pa.int64()),
            dist_col: pa.array([], pa.int64()),
        }
    )

    def pair_kernel(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        r = g.column("__r").to_numpy(zero_copy_only=False)
        bkt = g.column("__bkt").to_numpy(zero_copy_only=False)
        own = g.column("__own").to_numpy(zero_copy_only=False)
        order = np.lexsort((r, bkt))
        ids, r, bkt, own = ids[order], r[order], bkt[order], own[order]
        # per (bucket) run, each own-row pairs with the following rows at
        # rank distance < window (all present: they share this bucket).
        # r restarts between bucket runs, so searchsorted runs over a
        # composite key that is globally monotone across runs: runs are
        # bkt-ascending and r - bkt*w is in [0, 2w) inside a run, so
        # c = bkt*4w + (r - bkt*w) has disjoint ascending ranges per run
        # and preserves rank distance within a run.
        c = bkt * (4 * w) + (r - bkt * w)
        starts = np.flatnonzero(np.r_[True, bkt[1:] != bkt[:-1]])
        ends = np.r_[starts[1:], bkt.size]
        run_end = np.repeat(ends, ends - starts)
        pos = np.arange(bkt.size, dtype=np.int64)
        hi = np.minimum(
            np.searchsorted(c, c + w, side="left"), run_end
        )
        cnt = np.where(own, hi - pos - 1, 0)
        a_idx = np.repeat(pos, cnt)
        total = int(cnt.sum())
        run_start = np.cumsum(cnt) - cnt
        b_off = (
            np.arange(total, dtype=np.int64) - np.repeat(run_start, cnt) + 1
        )
        b_idx = a_idx + b_off
        return pa.table(
            {
                id_a: pa.array(ids[a_idx], pa.int64()),
                id_b: pa.array(ids[b_idx], pa.int64()),
                dist_col: pa.array(r[b_idx] - r[a_idx], pa.int64()),
            }
        )

    def bucket_fn(t: pa.Table) -> np.ndarray:
        return t.column("__bkt").to_numpy(zero_copy_only=False)

    # window buckets are dense 0..n/w: cap the exchange modulus while
    # keeping complete buckets colocated (bucket id IS already the group;
    # modulo only assigns groups to partitions)
    return exchange_map_groups(
        exploded, pair_kernel, None, 256, empty,
        bucket_fn=lambda t: bucket_fn(t) % 256,
    )


__all__ = ["global_rank", "snm_pairs"]
