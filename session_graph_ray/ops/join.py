"""Join helpers (SURVEY.md §2.6).

- ``broadcast_join``: small side shipped once via ``ray.put`` and merged per
  batch — the reference's alias-table lookup pattern
  (``/root/reference/pipeline/link_entities.py:270-277``) generalized. No
  shuffle; right side must fit in one worker's heap.
- ``hash_join``: both sides large — Ray's hash-partitioned ``Dataset.join``
  with partition count capped below the CPU budget (aggregator-actor
  deadlock guard, see .claude/skills/verify/SKILL.md gotchas).
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data


def composite_key(
    ds: "ray.data.Dataset",
    cols: "list[str]",
    out_col: str = "__ck",
) -> "ray.data.Dataset":
    """Append an EXACT composite-key column (``\\x1f``-joined canonical
    string forms) for multi-column equi-joins: derive once on each side,
    then pass ``out_col`` to ``bucket_join`` / ``skew_join`` / ``bloom``.

    Exact string concatenation, not a hash — a hash-collision composite key
    would silently join unrelated rows; strings cost a wider shuffle but can
    never be wrong. Null components render as an unambiguous sentinel so
    (1, null) never equals (1, 'None'). Integers are rendered canonically
    (no float formatting drift across engines)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def render(col) -> "pa.Array":
        if pa.types.is_integer(col.type):
            s = pc.cast(col, pa.string())
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            s = col
        elif pa.types.is_timestamp(col.type):
            s = pc.cast(pc.cast(col, pa.int64()), pa.string())
        else:
            s = pa.array(
                [None if v is None else repr(v) for v in col.to_pylist()],
                pa.string(),
            )
        return pc.fill_null(s, "\x00null\x00")

    def f(t: pa.Table) -> pa.Table:
        parts = [render(t.column(c)) for c in cols]
        joined = parts[0]
        for p in parts[1:]:
            joined = pc.binary_join_element_wise(joined, p, "\x1f")
        return t.append_column(out_col, joined)

    return ds.map_batches(f, batch_format="pyarrow")


def rename_batches(ds: "ray.data.Dataset", mapping: dict[str, str]) -> "ray.data.Dataset":
    """Rename columns via a real map_batches transform.

    ``Dataset.rename_columns`` is a projection op that Ray 2.49's planner can
    drop when the dataset's lineage already contains a hash-shuffle join and
    the result feeds another join (observed: acero raises "No match or
    multiple matches for key field reference" because blocks still carry the
    old names). A map_batches rewrite cannot be elided.
    """

    def f(t):
        return t.rename_columns([mapping.get(n, n) for n in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_join(
    left: "ray.data.Dataset",
    right_df: "pd.DataFrame | object",
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Merge a small table into every batch of a large Dataset — ARROW-
    NATIVE (VERDICT r3 #3: the pandas path round-tripped every big-side
    batch Arrow->pandas->Arrow just to merge an already-small right side).

    The right side is key-sorted ONCE on the driver and broadcast; each
    batch is one ``pc.index_in`` against the distinct right keys plus a
    vectorized repeat/take gather (the ``IndexedPairScorer._gather`` idiom,
    stages/scoring.py) — zero-copy Arrow end to end. Semantics match the
    old ``pandas.merge``: one-to-many right keys fan out, ``how`` is
    inner/left, null left keys never match, and when ``right_on`` ==
    ``left_on`` the single shared key column is kept (pandas' same-name
    merge contract). Non-key column overlap raises (pandas silently
    suffixed _x/_y — always a caller bug here)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    right_on = right_on or left_on
    rt = (right_df if isinstance(right_df, pa.Table)
          else pa.Table.from_pandas(right_df, preserve_index=False)
          ).replace_schema_metadata(None)
    # null right keys can never match (pandas NaN-key contract): drop them
    rt = rt.filter(pc.is_valid(rt.column(right_on)))
    rt = rt.take(pc.sort_indices(rt, sort_keys=[(right_on, "ascending")]))
    rkey = rt.column(right_on).combine_chunks()
    # run-length encode the sorted key: distinct values + start/count
    if rt.num_rows:
        k_np = rkey.to_numpy(zero_copy_only=False)
        new_run = np.r_[True, k_np[1:] != k_np[:-1]]
        starts = np.flatnonzero(new_run).astype(np.int64)
        counts = np.diff(np.r_[starts, rt.num_rows]).astype(np.int64)
        uniq = rkey.take(pa.array(starts))
    else:
        starts = counts = np.empty(0, np.int64)
        uniq = rkey
    same_key = right_on == left_on
    rcols = [c for c in rt.column_names if not (same_key and c == right_on)]
    ref = ray.put((rt.select(rcols) if same_key else rt, uniq, starts, counts))
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports inner/left, got {how}")

    def merge(batch: pa.Table) -> pa.Table:
        rtab, uq, st, ct = ray.get(ref)
        overlap = set(batch.column_names) & set(rtab.column_names)
        if overlap:
            raise ValueError(f"broadcast_join column overlap: {overlap}")
        idx = pc.index_in(batch.column(left_on), value_set=uq)
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        matched = ~np.isnan(idx_np)
        if how == "inner":
            sel = np.flatnonzero(matched)
            lt = batch.take(pa.array(sel)) if sel.size < batch.num_rows \
                else batch
            u = idx_np[sel].astype(np.int64)
            reps = ct[u]
            left_take = np.repeat(np.arange(len(u), dtype=np.int64), reps)
            base = np.repeat(st[u], reps)
            off = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(reps) - reps, reps)
            right_take = pa.array(base + off)
            out_left = lt.take(pa.array(left_take)) \
                if not np.array_equal(left_take,
                                      np.arange(lt.num_rows)) else lt
        else:  # left: unmatched rows fan out once with a null right side
            u = np.where(matched, idx_np, 0).astype(np.int64)
            cu = ct[u] if ct.size else np.zeros_like(u)
            su = st[u] if st.size else np.zeros_like(u)
            reps = np.where(matched, cu, 1).astype(np.int64)
            left_take = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                                  reps)
            base = np.repeat(np.where(matched, su, -1), reps)
            off = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(reps) - reps, reps)
            ridx = base + off
            right_take = pa.array(np.where(ridx < 0, 0, ridx),
                                  mask=(ridx < 0))
            out_left = batch.take(pa.array(left_take)) \
                if not np.array_equal(left_take,
                                      np.arange(batch.num_rows)) else batch
        gathered = rtab.take(right_take)
        cols = {c: out_left.column(c) for c in out_left.column_names}
        for c in gathered.column_names:
            cols[c] = gathered.column(c)
        return pa.table(cols)

    return left.map_batches(merge, batch_format="pyarrow",
                            batch_size=batch_size)


def join_partition_count(requested: int | None = None) -> int:
    """Partitions for Dataset.join, bounded by live CPUs (deadlock guard)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cap = max(2, min(ncpu // 2, 16))
    return min(requested, cap) if requested else cap


def bucket_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    how: str = "inner",
    num_buckets: int | None = None,
    left_schema=None,
    right_schema=None,
) -> "ray.data.Dataset":
    """Explicit partitioned hash join built from groupby (no JoinOperator).

    Pass ``left_schema`` / ``right_schema`` (pyarrow.Schema) whenever the
    caller knows them: ``.schema()`` on a lazy dataset whose lineage contains
    a shuffle EXECUTES that lineage just for introspection, doubling the work.

    Rationale: Ray 2.49's hash-shuffle ``Dataset.join`` mis-resolves key
    columns in DAGs where the join input's lineage contains prior shuffles
    (acero "No match or multiple matches for key field reference ..."), even
    when the rename runs inside map_batches. groupby shuffles are reliable,
    so: tag each side, bucket by ``crc32(key) % B``, union (schemas padded to
    a common superset), and pandas-merge the two sides inside each bucket via
    ``map_groups``. B bounds per-task memory; merges are vectorized.

    Caller contract: column names of the two sides must be disjoint (keys may
    differ or match). ``how``: inner / left / outer. Full-outer key
    contract (acero's): ``left_on`` holds the COALESCED join key (never
    null), ``right_on`` is null-faithful (null exactly on right-unmatched
    rows) — the pandas fallback path is normalized to match.
    """
    import numpy as np
    import pyarrow as pa

    def _to_pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError, ValueError):
            return pa.string()  # pandas object columns: strings in our uses

    B = num_buckets or join_partition_count() * 4
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"bucket_join requires disjoint column names; got {overlap}")
    ltypes = {n: _to_pa_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _to_pa_type(t) for n, t in zip(rschema.names, rschema.types)}
    target_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols] + [(c, rtypes[c]) for c in rcols]
    )

    def _bucket_of(col: pa.ChunkedArray) -> pa.Array:
        """Vectorized bucket assignment: numpy mod for integer keys, C-loop
        crc32 for strings (no per-row Python crc/encode in the hot path)."""
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.array((v % np.uint64(B)).astype(np.int32))
        from ..functions.hashing import crc32_np

        v = crc32_np([str(k) for k in col.to_pylist()])
        return pa.array((v % np.uint64(B)).astype(np.int32))

    def pad(side: int, key: str, own: list[str], other: list[str], other_t):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {c: t.column(c) for c in own if c in t.column_names}
            for c in other:
                cols[c] = pa.nulls(n, other_t[c])
            cols["__bkt"] = _bucket_of(t.column(key))
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            ordered = [*lcols, *rcols, "__bkt", "__side"]
            return pa.table({c: cols[c] for c in ordered})

        return f

    l2 = left.map_batches(pad(0, left_on, lcols, rcols, rtypes), batch_format="pyarrow")
    r2 = right.map_batches(pad(1, right_on, rcols, lcols, ltypes), batch_format="pyarrow")

    pd_how = {"inner": "inner", "left_outer": "left", "left": "left",
              "full_outer": "outer", "outer": "outer"}[how]
    pa_how = {"inner": "inner", "left_outer": "left outer", "left": "left outer",
              "full_outer": "full outer", "outer": "full outer"}[how]

    def merge_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(g.column("__side"), pa.scalar(0))
        lg = g.filter(mask).select(lcols).cast(
            pa.schema([(c, ltypes[c]) for c in lcols])
        )
        rg = g.filter(pc.invert(mask)).select(rcols).cast(
            pa.schema([(c, rtypes[c]) for c in rcols])
        )
        try:
            # acero hash join per bucket: zero pandas string conversion.
            # (The Ray-level JoinOperator bug is in plan-time key resolution,
            # not in acero itself — here both tables are literal in-memory.)
            # acero omits the right key column from the output; carry a copy
            # as a payload column so unmatched left-outer rows keep a
            # null-faithful right key (matching pandas-merge semantics)
            rg2 = rg.append_column("__rkey_copy", rg.column(right_on))
            out = lg.join(rg2, keys=[left_on], right_keys=[right_on],
                          join_type=pa_how, use_threads=False)
            if right_on not in out.column_names:
                out = out.append_column(right_on, out.column("__rkey_copy"))
            out = out.drop_columns(["__rkey_copy"])
            return out.select(target_schema.names).cast(target_schema)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            lpd = lg.to_pandas()
            rpd = rg.to_pandas()
            out = lpd.merge(rpd, how=pd_how, left_on=left_on, right_on=right_on)
            if pd_how == "outer":
                # match the acero path's key contract: left key coalesced
                out[left_on] = out[left_on].combine_first(out[right_on])
            try:
                return pa.Table.from_pandas(
                    out, schema=target_schema, preserve_index=False
                ).replace_schema_metadata(None)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                return pa.Table.from_pandas(
                    out, preserve_index=False
                ).replace_schema_metadata(None)

    return l2.union(r2).groupby("__bkt").map_groups(merge_bucket, batch_format="pyarrow")


def drop_both_member_pairs(
    pairs: "ray.data.Dataset",
    members: "ray.data.Dataset",
    n_members: int,
    pairs_schema,
    member_col: str = "member_id",
    broadcast_max: int = 2_000_000,
) -> "ray.data.Dataset":
    """Drop pair rows whose BOTH id columns appear in ``members`` — the
    incremental pipelines' "skip old-vs-old pairs" filter (their edges are
    already covered by the previous run's star edges).

    Size-gated like ``ops.spandedup._semi_join_int`` (VERDICT r2 #5): at or
    below ``broadcast_max`` member rows the sorted-id array broadcasts once
    (8 B/id) and membership is one searchsorted per batch; above it the
    membership test is two LEFT ``bucket_join`` flag passes — no driver pull
    of a 10^9-row id set, the 100-TB plan. ``members`` must be one distinct
    uint64-compatible column named ``member_col``; ``pairs_schema`` must
    name ``id_a``/``id_b`` plus any payload columns (introspecting a lazy
    shuffle lineage for the schema would execute it twice).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if n_members <= broadcast_max:
        mem = members.materialize() if n_members else members
        arr = (
            np.sort(
                np.concatenate(
                    [
                        np.asarray(b[member_col])
                        for b in mem.iter_batches(batch_format="numpy")
                    ]
                ).astype(np.uint64)
            )
            if n_members
            else np.empty(0, np.uint64)
        )
        ref = ray.put(arr)

        def flt(t: pa.Table) -> pa.Table:
            old = ray.get(ref)
            if old.size == 0:
                return t
            a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
            b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)

            def member(v: np.ndarray) -> np.ndarray:
                idx = np.searchsorted(old, v)
                return (idx < old.size) & (old[np.minimum(idx, old.size - 1)] == v)

            return t.filter(pa.array(~(member(a) & member(b))))

        return pairs.map_batches(flt, batch_format="pyarrow")

    def tag(col: str, flag: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    col: pc.cast(t.column(member_col), pa.uint64()),
                    flag: pa.array(
                        np.ones(t.num_rows, dtype=np.int8), pa.int8()
                    ),
                }
            )

        return f

    mschema_a = pa.schema([("__ma", pa.uint64()), ("__fa", pa.int8())])
    mschema_b = pa.schema([("__mb", pa.uint64()), ("__fb", pa.int8())])
    flagged = bucket_join(
        bucket_join(
            pairs,
            members.map_batches(tag("__ma", "__fa"), batch_format="pyarrow"),
            left_on="id_a", right_on="__ma", how="left",
            left_schema=pairs_schema, right_schema=mschema_a,
        ),
        members.map_batches(tag("__mb", "__fb"), batch_format="pyarrow"),
        left_on="id_b", right_on="__mb", how="left",
        left_schema=pa.schema(list(pairs_schema) + list(mschema_a)),
        right_schema=mschema_b,
    )

    def keep(t: pa.Table) -> pa.Table:
        both = pc.and_kleene(
            pc.is_valid(t.column("__fa")), pc.is_valid(t.column("__fb"))
        )
        return t.filter(pc.invert(both)).select(list(pairs_schema.names))

    return flagged.map_batches(keep, batch_format="pyarrow")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    return left.join(
        right,
        join_type=join_type,
        num_partitions=join_partition_count(num_partitions),
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )
