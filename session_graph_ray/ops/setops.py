"""Distinct set operations between two keyed datasets: INTERSECT / EXCEPT.

SQL set semantics (DISTINCT on both sides, then membership), as a
distributed operator: each side compresses to per-batch DISTINCT keys
tagged with a side bit BEFORE the exchange (shuffle volume is bounded by
distinct keys per batch, not rows), then one bucketed exchange on
``key % B`` whose kernel ORs the side bits per key run and keeps keys
matching the op's mask. The union-of-complete-buckets contract of
``ops/exchange`` makes the kernel partition-independent.

The D-family ops (SURVEY.md §2.9) cover dedup/union; this adds the
remaining relational set algebra the reference expresses through SPARQL
``FILTER EXISTS`` / ``MINUS`` patterns (cross-source overlap reports).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_LEFT = np.int64(1)
_RIGHT = np.int64(2)
_MASK = {"intersect": 3, "except": 1, "except_right": 2}


def key_set_op(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    op: str,
    out_col: str = "key",
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """DISTINCT ``left_key`` values related to DISTINCT ``right_key`` values
    by ``op``: ``intersect`` (in both), ``except`` (left only),
    ``except_right`` (right only). Keys must be integer-typed. Returns one
    int64 column ``out_col`` of qualifying keys (unordered — callers sort).
    """
    if op not in _MASK:
        raise ValueError(f"op must be one of {sorted(_MASK)}; got {op!r}")
    want = _MASK[op]
    B = num_buckets

    def tag(key_col: str, side: np.int64):
        def f(t: pa.Table) -> pa.Table:
            k = np.unique(
                t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            return pa.table({
                out_col: pa.array(k),
                "__side": pa.array(np.full(len(k), side, dtype=np.int64)),
            })

        return f

    def bucket_fn(t: pa.Table) -> np.ndarray:
        k = t.column(out_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    empty = pa.schema([(out_col, pa.int64())]).empty_table()

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        k = g.column(out_col).to_numpy(zero_copy_only=False)
        s = g.column("__side").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, ss = k[order], s[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        bits = np.bitwise_or.reduceat(ss, starts)
        keep = ks[starts][bits == want]
        return pa.table({out_col: pa.array(keep, pa.int64())})

    from .exchange import exchange_map_groups

    tagged = left.map_batches(
        tag(left_key, _LEFT), batch_format="pyarrow", batch_size=65536
    ).union(
        right.map_batches(
            tag(right_key, _RIGHT), batch_format="pyarrow", batch_size=65536
        )
    )
    return exchange_map_groups(tagged, kernel, None, B, empty, bucket_fn=bucket_fn)
