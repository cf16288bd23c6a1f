"""Stage 3 — transitive clustering: distributed union-find over match edges.

Reference semantic: entities sharing a canonical key merge under one
representative (same-QID => ``owl:sameAs``,
``/root/reference/pipeline/link_entities.py:741-754``). The reference elects
``uris[0]`` — list-order dependent; here the canonical id is ``min(id)`` so
the output is order-free (SURVEY.md §2.11 note).

Algorithm: hash-partitioned min-label propagation to fixpoint — no driver-side
union-find state (north_rule). All node/label values are uint64, so every
round is int-bucketed numpy: bucket = node % B, per-bucket sort +
``np.minimum.reduceat``. Each label row carries a ``chk`` fingerprint column
computed in the same kernel, so convergence detection is a single cheap
``Sum`` over the already-materialized label table — one extra action per
round, zero extra passes.

    m       = bidir_edges ⋈ labels on src -> (node=dst, label)
    labels' = (m ∪ labels).bucket_min(node)
    stop when Sum(chk') == Sum(chk)

Convergence takes O(diameter) rounds. The blocking stage keeps diameters
O(1) by construction (exact blocks are stars over the min; chunked hot
blocks bridge through a star over chunk heads), so 2-4 rounds are typical;
if ``cfg.max_cluster_rounds`` is hit before the fixpoint, a warning is
raised rather than silently emitting split clusters.

Rows that never matched anything become their own singleton cluster via a
left join back to the corpus id list (the reference keeps unlinked entities
as-is rather than dropping them, ``link_entities.py:578-584``).
"""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..config import ERConfig
from ..functions.minhash import mix64

_LABELS_SCHEMA = pa.schema(
    [("node", pa.uint64()), ("label", pa.uint64()), ("chk", pa.int64())]
)


def _min_by_node(ds: "ray.data.Dataset", B: int) -> "ray.data.Dataset":
    """groupby(node).min(label) + per-row chk fingerprint, int-bucketed:
    bucket by ``node % B`` (one numpy mod), then per-bucket lexsort +
    ``np.minimum.reduceat`` — no per-key Python, no string shuffles."""

    def node_bucket(t: pa.Table) -> np.ndarray:
        nodes = t.column("node").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (nodes % np.uint64(B)).astype(np.int64)

    def min_bucket(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False).astype(np.uint64)
        label = g.column("label").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((label, node))
        node, label = node[order], label[order]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        out_node = node[starts]
        out_label = label[starts]  # sorted secondary => min per node
        chk = ((mix64(out_node) ^ mix64(out_label)) >> np.uint64(33)).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(out_node, pa.uint64()),
                "label": pa.array(out_label, pa.uint64()),
                "chk": pa.array(chk, pa.int64()),
            }
        )

    from ..ops.exchange import exchange_map_groups

    return exchange_map_groups(
        ds, min_bucket, None, B, _LABELS_SCHEMA.empty_table(),
        bucket_fn=node_bucket,
    )


def _checksum(labels: "ray.data.Dataset") -> int:
    out = labels.aggregate(Sum("chk", alias_name="s"))
    return int(out["s"] or 0)


def _join_msgs(
    bidir: "ray.data.Dataset", labels: "ray.data.Dataset", B: int
) -> "ray.data.Dataset":
    """(src, dst) ⋈ (node, label) on src==node -> (node=dst, label), as a
    tagged-union int-bucketed merge (same plan shape as ops.join.bucket_join,
    specialized to uint64 keys and a projected output). The label side also
    passes through as (node, label) rows, so a round's min-reduce consumes
    this operator's output directly — the labels table enters ONE shuffle
    per round instead of two (the old ``msgs.union(labels)`` shape)."""

    def pad_edges(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("src"),
                "dst": t.column("dst"),
                "label": pa.nulls(n, pa.uint64()),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def pad_labels(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("node"),
                "dst": pa.nulls(n, pa.uint64()),
                "label": t.column("label"),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    l2 = bidir.map_batches(pad_edges, batch_format="pyarrow")
    r2 = labels.map_batches(pad_labels, batch_format="pyarrow")

    def merge_bucket(g: pa.Table) -> pa.Table:
        # split sides BEFORE to_numpy: the null-padded uint64 columns would
        # otherwise decay to float64 and corrupt ids above 2^53
        side_eq = pc.equal(g["__side"], pa.scalar(0, pa.int8()))
        ge = g.filter(side_eq)
        gl = g.filter(pc.invert(side_eq))
        ek = ge.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        edst = ge.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        lk = gl.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        ll = gl.column("label").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(lk)
        lk, ll = lk[order], ll[order]
        if not lk.size:
            return pa.table({"node": pa.array([], pa.uint64()),
                             "label": pa.array([], pa.uint64())})
        pos = np.searchsorted(lk, ek)
        pos_c = np.minimum(pos, lk.size - 1)
        hit = (pos < lk.size) & (lk[pos_c] == ek)
        # matched messages + label-side passthrough (keeps every node's
        # current label in play for the min-reduce without a second scan)
        return pa.table(
            {
                "node": pa.array(np.concatenate([edst[hit], lk]), pa.uint64()),
                "label": pa.array(np.concatenate([ll[pos_c[hit]], ll]), pa.uint64()),
            }
        )

    from ..ops.exchange import exchange_map_groups

    def k_bucket(t: pa.Table) -> np.ndarray:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    msgs_schema = pa.schema([("node", pa.uint64()), ("label", pa.uint64())])
    return exchange_map_groups(
        l2.union(r2), merge_bucket, None, B, msgs_schema.empty_table(),
        bucket_fn=k_bucket,
    )


def _propagate_driver(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Small-edge-set fast path: one vectorized min-label fixpoint with
    pointer jumping in the driver (O(E) numpy per round, O(log n) rounds).
    Output is identical to the distributed fixpoint — label = min reachable
    id — it only skips per-round shuffle overhead that dwarfs the work when
    the edge table is a few MB. Gated by ``cfg.driver_cluster_max_edges``."""
    parts_a, parts_b = [], []
    for b in edges.select_columns(["id_a", "id_b"]).iter_batches(
        batch_format="numpy"
    ):
        parts_a.append(np.asarray(b["id_a"]).astype(np.uint64))
        parts_b.append(np.asarray(b["id_b"]).astype(np.uint64))
    a = np.concatenate(parts_a) if parts_a else np.array([], np.uint64)
    b = np.concatenate(parts_b) if parts_b else np.array([], np.uint64)
    if not a.size:
        return ray.data.from_arrow(_LABELS_SCHEMA.empty_table())
    ids = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(ids, a)
    ib = np.searchsorted(ids, b)
    lab = np.arange(len(ids))  # index labels; ids sorted => min index == min id
    while True:
        m = np.minimum(lab[ia], lab[ib])
        new = lab.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        new = new[new]  # pointer jumping: label of my label
        if np.array_equal(new, lab):
            break
        lab = new
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(ids, pa.uint64()),
             "label": pa.array(ids[lab], pa.uint64())}
        )
    )


def propagate_labels(
    edges: "ray.data.Dataset", cfg: ERConfig,
    checkpoint_cb=None,
    n_edges: int | None = None,
) -> "ray.data.Dataset":
    """(id_a, id_b) uint64 match edges -> (node, label) with label = min
    reachable id. ``checkpoint_cb(round_idx, labels_ds)`` is invoked per
    round when given (per-round lineage checkpointing hook). Pass ``n_edges``
    when the caller already knows the edge count (stage manifest /
    materialized metadata) to avoid an extra materialize+count pass."""

    def bidirect(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch.column("id_a"), pa.uint64()).combine_chunks()
        b = pc.cast(batch.column("id_b"), pa.uint64()).combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    def part_of(n_rows: int) -> int:
        # volume-adaptive round shape: per-round shuffle overhead scales with
        # partition count, so size partitions to the edge volume (~500k rows
        # per partition) — a small edge table (post-threshold) iterates in
        # narrow rounds, a 100-TB one uses the full configured width
        return max(2, min(cfg.join_partitions, -(-n_rows // 500_000)))

    narrow = edges.select_columns(["id_a", "id_b"])
    if n_edges is None:
        narrow = narrow.materialize()
        n_edges = narrow.count()
    if n_edges <= cfg.driver_cluster_max_edges:
        return _propagate_driver(narrow)
    n_bidir = 2 * n_edges
    P = part_of(n_bidir)
    # repartition BEFORE the bidirect map: edges inherit the (wide) upstream
    # block count; coalescing first means P map tasks instead of hundreds
    bidir = (
        narrow.repartition(P)
        .map_batches(bidirect, batch_format="pyarrow")
        .materialize()
    )
    if n_bidir == 0:  # nothing to merge: all-singleton corpus
        return ray.data.from_arrow(_LABELS_SCHEMA.empty_table())
    B = cfg.hash_buckets

    def init_labels(batch: pa.Table) -> pa.Table:
        # seed with min(self, neighbors): equals the result of round 1 at no
        # extra shuffle cost — star-shaped clusters then converge in 1 round
        src = batch.column("src").combine_chunks()
        dst = batch.column("dst").combine_chunks()
        return pa.table(
            {"node": pa.concat_arrays([src, src]),
             "label": pa.concat_arrays([src, dst])}
        )

    import os
    import time

    trace = bool(os.environ.get("SGR_TRACE"))
    t0 = time.time()
    # no per-round repartition needed: the exchange emits one block per
    # gather partition, so every round is identically shaped by construction
    # (the old groupby form grew block counts geometrically across rounds —
    # 16 -> 48 -> 112 -> 240 measured — and needed a repartition barrier)
    labels = (
        _min_by_node(bidir.map_batches(init_labels, batch_format="pyarrow"), B)
        .materialize()
    )
    prev_sum = _checksum(labels)
    if trace:
        print(f"[labels] init: {time.time() - t0:.2f}s "
              f"blocks={labels.num_blocks()}", flush=True)
    converged = False
    for rnd in range(cfg.max_cluster_rounds):
        t0 = time.time()
        # _join_msgs output already includes the label-side passthrough rows
        msgs = _join_msgs(bidir, labels.select_columns(["node", "label"]), B)
        new_labels = _min_by_node(msgs, B).materialize()
        new_sum = _checksum(new_labels)
        if trace:
            print(f"[labels] round {rnd}: {time.time() - t0:.2f}s", flush=True)
        labels = new_labels
        if checkpoint_cb is not None:
            checkpoint_cb(rnd, labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        warnings.warn(
            f"label propagation hit max_cluster_rounds={cfg.max_cluster_rounds} "
            "before the fixpoint — clusters with larger diameters may be split; "
            "raise ERConfig.max_cluster_rounds",
            RuntimeWarning,
        )
    return labels.select_columns(["node", "label"])


def assignments(
    corpus_ids: "ray.data.Dataset", labels: "ray.data.Dataset", cfg: ERConfig,
    n_labels_ub: int | None = None,
) -> "ray.data.Dataset":
    """Every corpus row (``file_id_u64``) -> (file_id_u64, canonical_u64);
    unmatched rows map to themselves (singleton clusters, including
    non-scorable rows). Left join as the same int-bucketed merge.

    Pass ``n_labels_ub`` (any cheap upper bound on the label-table rows, e.g.
    2x the edge count) to enable the broadcast form below
    ``cfg.broadcast_assign_max_labels``: the label table ships once via the
    object store and every corpus block does a local searchsorted — no
    shuffle of the (big) corpus-id side at all."""
    if (
        n_labels_ub is not None
        and n_labels_ub <= cfg.broadcast_assign_max_labels
    ):
        lt = labels.to_pandas()
        if "node" in lt.columns:
            lk = lt["node"].to_numpy(np.uint64)
            ll = lt["label"].to_numpy(np.uint64)
        else:  # empty / placeholder-schema label table (no-match corpus)
            lk = np.array([], np.uint64)
            ll = np.array([], np.uint64)
        order = np.argsort(lk)
        ref = ray.put((lk[order], ll[order]))

        def map_assign(t: pa.Table) -> pa.Table:
            lk_s, ll_s = ray.get(ref)
            ids = t.column("file_id_u64").to_numpy(
                zero_copy_only=False
            ).astype(np.uint64)
            canon = ids.copy()
            if lk_s.size:
                pos = np.searchsorted(lk_s, ids)
                pos_c = np.minimum(pos, lk_s.size - 1)
                hit = (pos < lk_s.size) & (lk_s[pos_c] == ids)
                canon[hit] = ll_s[pos_c[hit]]
            return pa.table(
                {
                    "file_id_u64": pa.array(ids, pa.uint64()),
                    "canonical_u64": pa.array(canon, pa.uint64()),
                }
            )

        return corpus_ids.select_columns(["file_id_u64"]).map_batches(
            map_assign, batch_format="pyarrow"
        )
    B = cfg.hash_buckets

    def pad_ids(t: pa.Table) -> pa.Table:
        ids = t.column("file_id_u64").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("file_id_u64"),
                "label": pa.nulls(n, pa.uint64()),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def pad_labels(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("node"),
                "label": t.column("label"),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def merge_bucket(g: pa.Table) -> pa.Table:
        side_eq = pc.equal(g["__side"], pa.scalar(0, pa.int8()))
        gi = g.filter(side_eq)
        gl = g.filter(pc.invert(side_eq))
        ids = gi.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        lk = gl.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        ll = gl.column("label").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(lk)
        lk, ll = lk[order], ll[order]
        canon = ids.copy()
        if lk.size:
            pos = np.searchsorted(lk, ids)
            pos_c = np.minimum(pos, lk.size - 1)
            hit = (pos < lk.size) & (lk[pos_c] == ids)
            canon[hit] = ll[pos_c[hit]]
        return pa.table(
            {
                "file_id_u64": pa.array(ids, pa.uint64()),
                "canonical_u64": pa.array(canon, pa.uint64()),
            }
        )

    l2 = corpus_ids.select_columns(["file_id_u64"]).map_batches(
        pad_ids, batch_format="pyarrow"
    )
    r2 = labels.map_batches(pad_labels, batch_format="pyarrow")
    from ..ops.exchange import exchange_map_groups

    def k_bucket(t: pa.Table) -> np.ndarray:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    out_schema = pa.schema(
        [("file_id_u64", pa.uint64()), ("canonical_u64", pa.uint64())]
    )
    return exchange_map_groups(
        l2.union(r2), merge_bucket, None, B, out_schema.empty_table(),
        bucket_fn=k_bucket,
    )


def assignments_hex(assign_u64: "ray.data.Dataset") -> "ray.data.Dataset":
    """(file_id_u64, canonical_u64) -> (file_id, canonical_file_id) as the
    16-hex-char public id form (pure vectorized formatting — the u64 ids ARE
    the hex ids' numeric value, see functions.hashing.sha256_u64)."""
    from ..functions.hashing import u64_to_hex

    def fmt(t: pa.Table) -> pa.Table:
        f = t.column("file_id_u64").to_numpy(zero_copy_only=False)
        c = t.column("canonical_u64").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "file_id": pa.array(u64_to_hex(f), pa.string()),
                "canonical_file_id": pa.array(u64_to_hex(c), pa.string()),
            }
        )

    return assign_u64.map_batches(fmt, batch_format="pyarrow")
