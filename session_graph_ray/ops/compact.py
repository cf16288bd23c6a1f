"""Latest-row-per-key compaction — the CDC / upsert / snapshot operator.

Given a table with many versions per key, keep exactly the row with the
maximum ``(order_col, tiebreak_col)`` per key. This is the compaction step
of every log-structured ingest (apply a change stream to get current
state) and the "keep newest crawl of each URL" step of a training-data
refresh.

Shape: one bucketed hash exchange on ``key % B`` (``ops/exchange`` — the
same one-round scatter/gather every int-keyed kernel here uses, byte-gated
to Ray's streaming sort shuffle above 32 GiB), then a per-partition
lexsort + last-of-run ``take``. The kernel is correct over any union of
complete key buckets, payload columns ride through untouched (``take`` on
the Arrow table — no per-column Python), and ties are impossible when
``tiebreak_col`` is unique (the caller's contract; event ids / row uuids).

Reference analog: the record cache keeps one current linking decision per
entity and later runs overwrite earlier ones
(``/root/reference/pipeline/link_entities.py:604-641``); this is that
"latest wins" semantics as a distributed batch operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import ERConfig


def latest_per_key(
    ds: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    schema: pa.Schema,
    cfg: ERConfig | None = None,
) -> "ray.data.Dataset":
    """Keep the row with max ``(order_col, tiebreak_col)`` per ``key_col``.

    ``key_col`` must be integer-typed (ids are uint64/int64 throughout this
    engine); ``order_col`` must cast losslessly to int64 (ints, timestamps).
    ``schema`` pins the output schema for empty partitions (``.schema()``
    on a shuffled lineage re-executes it)."""
    cfg = cfg or ERConfig()
    B = cfg.hash_buckets

    def bucket_fn(t: pa.Table) -> np.ndarray:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        k = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        o = g.column(order_col).to_numpy(zero_copy_only=False)
        o = o.view("i8") if o.dtype.kind == "M" else o.astype(np.int64)
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # ascending (key, order, tiebreak): the LAST row of each key run is
        # the per-key max — one lexsort, one take, payload untouched
        order = np.lexsort((tb, o, k))
        ks = k[order]
        ends = np.flatnonzero(np.r_[ks[1:] != ks[:-1], True])
        return g.take(pa.array(order[ends]))

    from .exchange import exchange_map_groups

    return exchange_map_groups(
        ds, kernel, None, B, schema.empty_table(), bucket_fn=bucket_fn
    )


def apply_cdc(
    base: "ray.data.Dataset",
    changes: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    op_col: str,
    schema: pa.Schema,
    delete_op: str = "D",
    cfg: ERConfig | None = None,
) -> "ray.data.Dataset":
    """Apply a changelog to a base snapshot: ``base UNION changes`` ->
    latest row per key by ``(order, tiebreak)`` -> rows whose final op is
    ``delete_op`` drop out. The snapshot-maintenance primitive of every
    log-structured ingest (upserts win by recency, deletes tombstone the
    key) — one bucketed exchange total, payload rides untouched.

    Both inputs must share ``schema`` (including ``op_col``; tag base rows
    with a non-delete op). The caller guarantees base orders sort below
    change orders for the same key — true by construction when base is a
    compacted earlier epoch and changes are the next epoch's log."""
    merged = base.union(changes)
    latest = latest_per_key(merged, key_col, order_col, tiebreak_col,
                            schema, cfg)

    def live(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t[op_col], pa.scalar(delete_op)))

    return latest.map_batches(live, batch_format="pyarrow")
