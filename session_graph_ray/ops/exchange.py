"""One-round hash exchange for int-bucketed group kernels.

Every wide kernel in this engine follows the same shape: each row belongs to
a small integer bucket (``key % cfg.hash_buckets``), every row of a bucket
must land in one task, and the kernel itself lexsorts its input and reduces
per key-run — so it is correct over ANY union of complete buckets. That
contract needs hash *colocation*, not ordering.

``Dataset.groupby(bucket).map_groups(kernel)`` delivers colocation via Ray's
sort-based shuffle, which pays a sample -> sort-map -> sort-reduce barrier
per exchange (measured 8-15 s of non-CPU wall at bench scale — the dominant
scaling-efficiency loss of the blocking stage once the kernels were
vectorized, because it is ~constant in CPU count). This module provides the
same colocation as ONE scatter/gather round of plain Ray tasks:

    scatter: one task per input block — split the block by partition id
             (``bucket * P // B``: contiguous, even for uniform buckets)
    gather:  one task per partition — concat its P-slice from every block,
             run the kernel once over the whole partition table

``bucket_fn`` computes bucket ids INSIDE the scatter task (one numpy mod on
already-loaded columns), so callers don't pay a separate materialized pass
just to append a bucket column — at bench scale that pass alone moved
0.8 GB+ per exchange through the object store.

Scale notes (the 100-TB story):

- Object count is ``num_input_blocks x P``. P is sized from *metadata* byte
  totals to hold partitions near ``part_bytes`` (default 128 MiB), so a
  100-TB exchange would create ~10^6 x 10^3 objects — past the comfort zone
  of a single GCS. ``max_bytes`` therefore gates this path: above it the
  caller falls back to ``groupby().map_groups`` (Ray's sort shuffle streams,
  spills, and pipelines — the right machinery when the exchange itself is
  minutes long and the fixed barrier is noise).
- Gather tasks hold one partition in heap (~``part_bytes`` x a small concat
  factor); scatter tasks hold one input block. Both bounded.
- The exchange is eager (raw tasks, no streaming backpressure): callers pass
  a (nearly) materialized dataset — true for every call site (all of them
  exchange a compact int table, never raw content).

Reference analog: none — the reference is single-process (its grouping is a
Python dict, ``/root/reference/pipeline/link_entities.py:857-879``); this is
the distributed form of that dict.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data

# partitions target this many bytes each; a gather task's working set is a
# small multiple of it (concat + kernel output)
_PART_BYTES = 128 << 20
# above this input volume the one-round exchange gives way to Ray's
# streaming sort shuffle (object-count and heap bounds, see module doc)
_MAX_EXCHANGE_BYTES = 32 << 30


def _bucket_ids(tbl: pa.Table, bucket_col, bucket_fn) -> np.ndarray:
    if bucket_fn is not None:
        return np.asarray(bucket_fn(tbl), dtype=np.int64)
    return tbl.column(bucket_col).to_numpy(zero_copy_only=False).astype(np.int64)


@ray.remote
def _scatter(tbl: pa.Table, bucket_col, bucket_fn, B: int, P: int):
    """Split one block into P partition slices by ``bucket * P // B``.
    Negative buckets (sentinel rows, e.g. ROUTE_METRIC metric rows) go to
    partition 0 — kernels pass them through untouched."""
    if tbl.num_rows == 0:
        # empty pass-through blocks (e.g. a union side that produced no
        # rows) can surface without the bucket/key columns at all
        e = tbl.slice(0, 0)
        return tuple(e for _ in range(P)) if P > 1 else e
    b = _bucket_ids(tbl, bucket_col, bucket_fn)
    # % B defends against a caller handing raw keys instead of key % B:
    # pid >= P would fall outside the searchsorted bounds below and the
    # rows would vanish silently — a mod is one vectorized op
    pid = (np.clip(b, 0, None) % B) * P // B
    order = np.argsort(pid, kind="stable")
    bounds = np.searchsorted(pid[order], np.arange(P + 1))
    idx = pa.array(order)
    out = []
    for p in range(P):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        out.append(tbl.take(idx.slice(lo, hi - lo)))
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _gather(kernel: Callable[[pa.Table], pa.Table], empty: pa.Table, *parts):
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return empty
    t = pa.concat_tables(tbls).combine_chunks()
    return kernel(t)


def exchange_map_groups(
    ds: "ray.data.Dataset",
    kernel: Callable[[pa.Table], pa.Table],
    bucket_col: str | None,
    num_buckets: int,
    empty_table: pa.Table,
    bucket_fn: Callable[[pa.Table], np.ndarray] | None = None,
    part_bytes: int = _PART_BYTES,
    max_bytes: int = _MAX_EXCHANGE_BYTES,
    size_hint_bytes: int | None = None,
) -> "ray.data.Dataset":
    """Colocate complete bucket groups and apply ``kernel`` once per
    partition. ``kernel`` must be correct over any union of complete buckets
    (every kernel in this repo lexsorts and reduces per key-run, so it is).
    ``empty_table`` pins the output schema for empty partitions. Bucket ids
    come from ``bucket_fn(table) -> int64 ndarray`` when given (computed
    inside the scatter task — no extra pass), else from ``bucket_col``.

    Falls back to ``groupby`` + ``map_groups(kernel)`` above ``max_bytes``
    (see module doc) — same results, streaming sort-shuffle machinery.
    ``size_hint_bytes`` lets callers that know their volume route a huge
    exchange to the streaming fallback WITHOUT materializing (and pinning)
    the input first — at 100-TB scale the gate exists precisely so the
    input is never pinned whole, so learning the size by materializing
    would defeat it. Without a hint the size is only known after
    ``materialize()``; the fallback then still streams the kernel but the
    input has already been pinned once (lo-fi path, logged in module doc).
    """

    def _fallback(src: "ray.data.Dataset") -> "ray.data.Dataset":
        col = bucket_col
        if bucket_fn is not None:
            col = "__xbkt"

            def add_col(t: pa.Table) -> pa.Table:
                return t.append_column(
                    col, pa.array(_bucket_ids(t, None, bucket_fn), pa.int64())
                )

            src = src.map_batches(add_col, batch_format="pyarrow")
        return src.groupby(col).map_groups(kernel, batch_format="pyarrow")

    if size_hint_bytes is not None and size_hint_bytes > max_bytes:
        return _fallback(ds)  # stays lazy: never pinned whole
    mat = ds.materialize()  # executes (and pins) the upstream lineage
    total = int(mat.size_bytes() or 0)  # metadata-only on a materialized ds
    if total > max_bytes:
        return _fallback(mat)
    refs = mat.to_arrow_refs()
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    P = int(min(num_buckets, max(ncpu, -(-total // part_bytes))))
    P = max(P, 1)
    parts: list[list] = [[] for _ in range(P)]
    for r in refs:
        outs = _scatter.options(num_returns=P if P > 1 else 1).remote(
            r, bucket_col, bucket_fn, num_buckets, P
        )
        if P == 1:
            parts[0].append(outs)
        else:
            for p, o in enumerate(outs):
                parts[p].append(o)
    out_refs = [
        _gather.remote(kernel, empty_table, *parts[p]) for p in range(P)
    ]
    return ray.data.from_arrow_refs(out_refs)
