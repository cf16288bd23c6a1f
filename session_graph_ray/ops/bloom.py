"""Bloom-filter semi/anti-join prefilter (scale path for the J2/J4 joins).

At 10^12 probe rows the exchange IS the join cost: a plain semi-join
shuffles every probe row to meet the build keys. A Bloom filter of the
build keys is constant-size (``n_bits/8`` bytes no matter how many build
rows), builds in one streaming pass — per-block bitmaps OR-merged through
Ray's aggregate tree, never concatenated on a worker — broadcasts once via
``ray.put``, and filters the probe side *before* any shuffle, so only rows
that *might* match pay the exchange. False positives are then removed by an
exact bucketed join of the survivors against the deduplicated build keys,
making results exact at any filter density. For anti-joins the split
reverses: a Bloom "no" is a *definite* no (those rows are emitted with no
shuffle at all); only the "maybe" rows go through the exact join.

Reference analog: the cache-miss key-set lookup
(``/root/reference/pipeline/link_entities.py:604-641``) broadcasts the
exact cached-key set; at corpus scale the exact set no longer fits in a
worker heap — the Bloom bitmap is its constant-memory replacement, and the
exact-join residue restores the missing precision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import AggregateFn
from ray.data.block import BlockAccessor

from ..functions.hashing import hash64_np
from ..functions.sketch import splitmix64
from .join import bucket_join

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _key_u64(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Column -> uint64 key material (integers reinterpreted, strings
    hashed with the process-independent 64-bit string hash). Null slots
    get placeholder material — callers mask them out with the column's
    validity bitmap (see ``_might_match_mask``)."""
    if col.null_count:
        fill = 0 if not pa.types.is_string(col.type) else ""
        col = pc.fill_null(col, fill)
    if pa.types.is_integer(col.type):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash64_np(col.to_pylist())
    return hash64_np([str(v) for v in col.to_pylist()])


def _positions(x: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions by double hashing: pos_i = h1 + i*h2 (mod m).
    Both h1 and h2 are full-width splitmix64 mixes, h2 forced odd so the
    stride never degenerates; uint64 wrap-around is harmless mod m."""
    h1 = splitmix64(x)
    h2 = splitmix64(x ^ _GOLD) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


def build_bloom(
    ds: "ray.data.Dataset",
    key: str,
    n_bits: int = 1 << 23,
    k: int = 4,
) -> np.ndarray:
    """One streaming pass over the build side -> packed uint64 bitmap
    (``n_bits/8`` bytes; default 1 MiB ~= 1% fp at ~8.4M distinct keys —
    size n_bits ~= 10x expected distinct keys for ~1-2% fp).

    Per-block accumulate sets bits vectorized; Ray's aggregate merges the
    constant-size bitmaps pairwise up a tree, so no worker ever holds more
    than two bitmaps and the driver receives exactly one.
    """
    assert n_bits % 64 == 0

    def acc(bm: np.ndarray, block) -> np.ndarray:
        t = BlockAccessor.for_block(block).to_arrow()
        col = t.column(key)
        if col.null_count:
            col = col.drop_null()
        if len(col) == 0:
            return bm
        pos = _positions(_key_u64(col), n_bits, k).ravel()
        bm = bm.copy()
        np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        return bm

    fn = AggregateFn(
        init=lambda _: np.zeros(n_bits // 64, np.uint64),
        merge=np.bitwise_or,
        accumulate_block=acc,
        name="bloom",
    )
    res = ds.select_columns([key]).aggregate(fn)
    bm = res.get("bloom") if res else None
    return bm if bm is not None else np.zeros(n_bits // 64, np.uint64)


def _might_match_mask(col, bm_ref, n_bits: int, k: int) -> np.ndarray:
    bm = ray.get(bm_ref)
    x = _key_u64(col)
    pos = _positions(x, n_bits, k)
    hit = (bm[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    mask = hit.all(axis=0)
    if col.null_count:
        mask &= col.is_valid().to_numpy(zero_copy_only=False)
    return mask


def bloom_semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_schema: "pa.Schema",
    n_bits: int = 1 << 23,
    k: int = 4,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Exact semi-join (``anti=False``) or anti-join (``anti=True``) of
    ``left`` against the key set of ``right``, with a broadcast Bloom
    prefilter so only possible matches enter the exact join's shuffle.

    Semi: survivors(bloom) -> bucketed inner join against distinct right
    keys -> left columns. Anti: bloom-definite-nos unioned with the "maybe"
    rows that the exact left-join proves unmatched. ``left_schema`` is
    required (``.schema()`` on a shuffled lineage re-executes it)."""
    bm_ref = ray.put(build_bloom(right, right_on, n_bits=n_bits, k=k))

    def prefilter(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_might_match_mask(t.column(left_on), bm_ref, n_bits, k)))

    def definite_no(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(~_might_match_mask(t.column(left_on), bm_ref, n_bits, k)))

    maybe = left.map_batches(prefilter, batch_format="pyarrow")

    # exact residue: distinct build keys under a disjoint column name
    rkey = f"__bloom_{right_on}"

    def keys_only(t: pa.Table) -> pa.Table:
        col = t.column(right_on)
        if col.null_count:
            col = col.drop_null()
        return pa.table({rkey: col.unique()})

    hit = f"__bloom_hit_{right_on}"

    def mark(t: pa.Table) -> pa.Table:
        return t.append_column(hit, pa.array(np.ones(t.num_rows, np.int8)))

    rkeys = (
        right.select_columns([right_on])
        .map_batches(keys_only, batch_format="pyarrow")
        .groupby(rkey).count().drop_columns(["count()"])
        .map_batches(mark, batch_format="pyarrow")
    )

    key_t = left_schema.field(left_on).type
    joined = bucket_join(
        maybe, rkeys, left_on=left_on, right_on=rkey,
        how="left" if anti else "inner",
        left_schema=left_schema,
        right_schema=pa.schema([(rkey, key_t), (hit, pa.int8())]),
    )
    out_cols = [f.name for f in left_schema]
    if not anti:
        return joined.select_columns(out_cols)

    def unmatched(t: pa.Table) -> pa.Table:
        # match detection via the explicit marker column: the bucketed
        # join's key columns are not null-faithful for unmatched rows (the
        # acero path backfills the right key; the pandas path yields NaN)
        return t.filter(
            pc.is_null(t.column(hit), nan_is_null=True)
        ).select(out_cols)

    residue = joined.map_batches(unmatched, batch_format="pyarrow")
    nos = left.map_batches(definite_no, batch_format="pyarrow")
    return nos.union(residue)
