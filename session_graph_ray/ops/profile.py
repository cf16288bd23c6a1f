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

    def merge(g: pa.Table) -> pa.Table:
        # arrow group input: pandas concat of partials with all-null string
        # columns (numeric-only profiles) trips dtype FutureWarnings
        regs = empty_registers()
        for b in g.column("hll").to_pylist():
            regs = merge_registers(regs, np.frombuffer(b, np.uint8))
        mm_n = pc.min_max(g.column("min_num"))
        mm_x = pc.min_max(g.column("max_num"))
        mm_s = pc.min_max(g.column("min_str"))
        mm_xs = pc.min_max(g.column("max_str"))
        return pa.table(
            {
                "col": g.column("col").slice(0, 1),
                "n": pa.array([pc.sum(g.column("n")).as_py() or 0], pa.int64()),
                "n_null": pa.array(
                    [pc.sum(g.column("n_null")).as_py() or 0], pa.int64()
                ),
                "min_num": pa.array([mm_n["min"].as_py()], pa.float64()),
                "max_num": pa.array([mm_x["max"].as_py()], pa.float64()),
                "min_str": pa.array([mm_s["min"].as_py()], pa.string()),
                "max_str": pa.array([mm_xs["max"].as_py()], pa.string()),
                "n_distinct_approx": pa.array(
                    [int(round(estimate(regs)))], pa.int64()
                ),
            }
        )

    return (
        ds.select_columns(columns)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("col")
        .map_groups(merge, batch_format="pyarrow")
    )


def value_histogram(
    ds: "ray.data.Dataset",
    col: str,
    bin_width: float,
    n_bins: int,
    key: str | None = None,
) -> "ray.data.Dataset":
    """Exact fixed-width histogram of a numeric column, optionally per key.

    bin = min(max(floor(value / bin_width), 0), n_bins - 1) — the identical
    IEEE double divide+floor runs in the SQL oracle, so counts match
    exactly. Each batch collapses to <= |keys| x n_bins partial rows
    (vectorized lexsort + run-length); the final combine is one kernel over
    one coalesced block — constant-size exchange regardless of table size.
    """
    import numpy as np
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.minimum(np.maximum(np.floor(v / bin_width), 0.0),
                       float(n_bins - 1)).astype(np.int64)
        if key is not None:
            kv = t.column(key).to_numpy(zero_copy_only=False)
            order = np.lexsort((b, kv))
            ks, bs = kv[order], b[order]
            start = np.ones(len(ks), dtype=bool)
            start[1:] = (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
            gid = np.cumsum(start) - 1
            n = np.bincount(gid).astype(np.int64)
            return pa.table(
                {
                    key: pa.array(ks[start]),
                    "bin": pa.array(bs[start]),
                    "n": pa.array(n),
                }
            )
        vals, counts = np.unique(b, return_counts=True)
        return pa.table(
            {"bin": pa.array(vals), "n": pa.array(counts.astype(np.int64))}
        )

    def combine(t: pa.Table) -> pa.Table:
        b = t.column("bin").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        if key is not None:
            kv = t.column(key).to_numpy(zero_copy_only=False)
            order = np.lexsort((b, kv))
            ks, bs, ns = kv[order], b[order], n[order]
            start = np.ones(len(ks), dtype=bool)
            start[1:] = (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
            gid = np.cumsum(start) - 1
            sums = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, dtype=np.int64)
            np.add.at(sums, gid, ns)
            return pa.table(
                {
                    key: pa.array(ks[start]),
                    "bin": pa.array(bs[start]),
                    "n": pa.array(sums),
                }
            )
        vals, inv = np.unique(b, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, n)
        return pa.table({"bin": pa.array(vals), "n": pa.array(sums)})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return parts.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=1 << 30
    )
