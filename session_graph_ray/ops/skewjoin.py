"""Skew-aware equi-join: heavy probe keys bypass the shuffle.

A bucketed hash join is only as balanced as its key distribution: one hot
key (a default user id, an empty path, a bot account) sends all its rows to
a single bucket's merge task — at 10^12 rows that task IS the job, or an
OOM. The ER blocking stage already salts its hot blocks
(``ops/pairing.py``); this gives plain equi-joins the same protection:

1. Sketch the probe side's key frequencies with the bounded-state
   Misra-Gries pass (``ops/approx.approx_heavy_hitters`` — one streaming
   scan, O(buckets x capacity) rows shuffled, sound lower bounds).
2. Keys whose count exceeds ``heavy_min_rows`` are "heavy". Their build-side
   rows are gathered once and broadcast via ``ray.put`` (assumption,
   documented and enforced: heavy keys on the PROBE side are rare values
   with few BUILD-side rows — the dim-table side of a fact/dim join;
   ``max_broadcast_rows`` raises if violated rather than silently spilling).
3. Heavy probe rows join against the broadcast frame inside ``map_batches``
   — no shuffle, perfectly parallel across probe blocks.
4. All other rows take the normal bucketed hash join.
5. The union of the two paths is the exact join result: a probe row is
   heavy xor not, and both paths join against the complete build side.

Because the heavy set is detected from data (not configured), the operator
is safe to leave on: with no skew the sketch finds nothing and the whole
input takes the bucketed path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .approx import approx_heavy_hitters
from .join import bucket_join
from .util import pd_to_arrow


def detect_heavy_keys(
    ds: "ray.data.Dataset",
    key: str,
    heavy_min_rows: int,
    top_k: int = 64,
) -> np.ndarray:
    """Keys whose (lower-bound) frequency exceeds ``heavy_min_rows``.
    Misra-Gries counts are never inflated, so every returned key truly is
    heavy; a heavy key missed by the sketch (only possible past the top-k
    horizon) degrades performance, not correctness."""
    hh = approx_heavy_hitters(ds, key, k=top_k).to_pandas()
    return hh.loc[hh["n"] >= heavy_min_rows, key].to_numpy()


def skew_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_schema: "pa.Schema",
    right_schema: "pa.Schema",
    how: str = "inner",
    heavy_min_rows: int = 100_000,
    top_k: int = 64,
    max_broadcast_rows: int = 2_000_000,
    route_metrics: dict | None = None,
) -> "ray.data.Dataset":
    """Exact equi-join of ``left`` (probe / fact side, possibly skewed) with
    ``right`` (build / dim side). ``how``: inner or left (pandas semantics,
    matching ``bucket_join``). Column names must be disjoint.

    ``route_metrics`` (optional dict) receives ``n_heavy_keys`` and
    ``n_broadcast_rows`` — no silent routing."""
    heavy = detect_heavy_keys(left, left_on, heavy_min_rows, top_k)
    lcols = [f.name for f in left_schema]
    rcols = [f.name for f in right_schema]
    if route_metrics is not None:
        route_metrics["n_heavy_keys"] = int(len(heavy))
        route_metrics["n_broadcast_rows"] = 0
    if len(heavy) == 0:
        return bucket_join(
            left, right, left_on=left_on, right_on=right_on, how=how,
            left_schema=left_schema, right_schema=right_schema,
        )

    def build_rows(t: pa.Table) -> pa.Table:
        kv = t.column(right_on).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(kv, heavy)))

    build_pd = (
        right.map_batches(build_rows, batch_format="pyarrow")
        .to_pandas()
    )
    if len(build_pd) > max_broadcast_rows:
        raise ValueError(
            f"skew_join: {len(build_pd)} build rows for {len(heavy)} heavy "
            f"probe keys exceeds max_broadcast_rows={max_broadcast_rows}; "
            "the build side is itself skewed on these keys — pre-aggregate "
            "it or raise the cap explicitly"
        )
    if route_metrics is not None:
        route_metrics["n_broadcast_rows"] = int(len(build_pd))
    bref = ray.put(build_pd)

    target = pa.schema(
        [(f.name, f.type) for f in left_schema]
        + [(f.name, f.type) for f in right_schema]
    )

    def split(t: pa.Table, keep_heavy: bool) -> pa.Table:
        kv = t.column(left_on).to_numpy(zero_copy_only=False)
        m = np.isin(kv, heavy)
        return t.filter(pa.array(m if keep_heavy else ~m))

    def merge_heavy(t: pa.Table) -> pa.Table:
        part = split(t, keep_heavy=True)
        if part.num_rows == 0:
            return target.empty_table()
        build = ray.get(bref)
        out = part.to_pandas().merge(
            build, how=how, left_on=left_on, right_on=right_on
        )[[*lcols, *rcols]]
        try:
            # left-join misses surface as NaN in int columns; the typed
            # from_pandas turns them back into proper nulls
            return pa.Table.from_pandas(
                out, schema=target, preserve_index=False
            ).replace_schema_metadata(None)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            return pd_to_arrow(out)

    heavy_out = left.map_batches(merge_heavy, batch_format="pyarrow")
    rest = left.map_batches(
        lambda t: split(t, keep_heavy=False), batch_format="pyarrow"
    )
    rest_out = bucket_join(
        rest, right, left_on=left_on, right_on=right_on, how=how,
        left_schema=left_schema, right_schema=right_schema,
    )
    return heavy_out.union(rest_out)
