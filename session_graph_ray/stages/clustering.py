"""Stage 3 — transitive clustering: distributed union-find over match edges.

Reference semantic: entities sharing a canonical key merge under one
representative (same-QID => ``owl:sameAs``,
``/root/reference/pipeline/link_entities.py:741-754``). The reference elects
``uris[0]`` — list-order dependent; here the canonical id is ``min(file_id)``
so the output is order-free (SURVEY.md §2.11 note).

Algorithm: hash-partitioned min-label propagation to fixpoint — no driver-side
union-find state (north_rule). Each round uses bucket_join (the groupby-based
partitioned hash join from ops/join.py — Ray 2.49's native JoinOperator
mis-plans multi-join DAGs) plus native aggregates, fully vectorized:

    m1      = edges ⋈ labels on id_a -> (node=id_b, label=label(id_a))
    m2      = edges ⋈ labels on id_b -> (node=id_a, label=label(id_b))
    labels' = (m1 ∪ m2 ∪ labels).groupby(node).min(label)
    stop when checksum(labels') == checksum(labels)  (crc32 sum — scalar)

Converges in O(log d) rounds for cluster diameter d; ER clusters are shallow
(2-4 rounds typical). Each round materializes only the label table (nodes
that appear in >=1 edge — far smaller than the corpus).

Rows that never matched anything become their own singleton cluster via a
left join back to the corpus id list (the reference keeps unlinked entities
as-is rather than dropping them, ``link_entities.py:578-584``).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min, Sum

from ..config import ERConfig
from ..ops.join import rename_batches


def _label_checksum(labels: "ray.data.Dataset") -> int:
    """Order-free integer fingerprint of a (node, label) table."""

    def crc(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_pylist()
        labs = batch.column("label").to_pylist()
        s = [zlib.crc32(f"{n}={l}".encode()) for n, l in zip(nodes, labs)]
        return pa.table({"crc": pa.array(s, pa.int64())})

    out = labels.map_batches(crc, batch_format="pyarrow").aggregate(
        Sum("crc", alias_name="sum")
    )
    return int(out["sum"] or 0)


def propagate_labels(
    edges: "ray.data.Dataset", cfg: ERConfig,
    checkpoint_cb=None,
) -> "ray.data.Dataset":
    """(id_a, id_b) match edges -> (node, label) with label = min reachable id.

    Per round: two bucket-joins attach each endpoint's current label to the
    opposite endpoint as a message; union with the labels themselves; native
    ``Min`` aggregate per node. Everything is vectorized (pandas merges per
    bucket + Arrow kernels) — no per-node Python.

    ``checkpoint_cb(round_idx, labels_ds)`` is invoked per round when given
    (per-round lineage checkpointing hook)."""
    from ..ops.join import bucket_join, rename_batches

    def bidirect(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch.column("id_a"), pa.string()).combine_chunks()
        b = pc.cast(batch.column("id_b"), pa.string()).combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    # one bidirectional edge table => ONE join per round instead of two
    bidir = (
        edges.select_columns(["id_a", "id_b"])
        .map_batches(bidirect, batch_format="pyarrow")
        .repartition(cfg.join_partitions)
        .materialize()
    )
    if bidir.count() == 0:  # nothing to merge: all-singleton corpus
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()),
                      "label": pa.array([], pa.string())})
        )

    def init_labels(batch: pa.Table) -> pa.Table:
        # seed with min(self, neighbors): equals the result of round 1 at no
        # extra shuffle cost — star-shaped clusters then converge in 1 round
        src = batch.column("src").combine_chunks()
        dst = batch.column("dst").combine_chunks()
        return pa.table(
            {"node": pa.concat_arrays([src, src]),
             "label": pa.concat_arrays([src, dst])}
        )

    B = cfg.join_partitions * 4

    def _min_by_node(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        """groupby(node).min(label), bucketed: the native aggregate
        sort-shuffles every distinct node string; bucketing shuffles B small
        ints and reduces with one vectorized pandas groupby per bucket."""

        def add_bkt(t: pa.Table) -> pa.Table:
            nodes = t.column("node").to_pylist()
            bkt = [zlib.crc32(n.encode()) % B for n in nodes]
            return t.append_column("__bkt", pa.array(bkt, pa.int32()))

        import pandas as pd

        def min_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False)["label"].min()

        return (
            ds.map_batches(add_bkt, batch_format="pyarrow")
            .groupby("__bkt")
            .map_groups(min_bucket, batch_format="pandas")
        )

    labels = (
        _min_by_node(bidir.map_batches(init_labels, batch_format="pyarrow"))
        .repartition(cfg.join_partitions)
        .materialize()
    )

    prev_sum = _label_checksum(labels)
    for rnd in range(cfg.max_cluster_rounds):
        lab = rename_batches(labels, {"node": "node_l", "label": "label_l"})
        msgs = bucket_join(
            bidir, lab, left_on="src", right_on="node_l",
            num_buckets=cfg.join_partitions * 4,
            left_schema=pa.schema([("src", pa.string()), ("dst", pa.string())]),
            right_schema=pa.schema([("node_l", pa.string()), ("label_l", pa.string())]),
        ).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("label_l")}),
            batch_format="pyarrow",
        )
        new_labels = (
            _min_by_node(msgs.union(labels))
            .repartition(cfg.join_partitions)
            .materialize()
        )
        new_sum = _label_checksum(new_labels)
        labels = new_labels
        if checkpoint_cb is not None:
            checkpoint_cb(rnd, labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def assignments(
    corpus_ids: "ray.data.Dataset", labels: "ray.data.Dataset", cfg: ERConfig
) -> "ray.data.Dataset":
    """Every corpus row -> (file_id, canonical_file_id); unmatched rows map to
    themselves (singleton clusters, including non-scorable rows)."""
    from ..ops.join import bucket_join

    lab = rename_batches(labels, {"node": "file_id_l", "label": "canonical"})
    joined = bucket_join(
        corpus_ids.select_columns(["file_id"]),
        lab,
        left_on="file_id",
        right_on="file_id_l",
        how="left",
        num_buckets=cfg.join_partitions * 4,
        left_schema=pa.schema([("file_id", pa.string())]),
        right_schema=pa.schema([("file_id_l", pa.string()), ("canonical", pa.string())]),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        fid = batch.column("file_id")
        canon = batch.column("canonical")
        canon = pc.coalesce(canon, fid)
        return pa.table({"file_id": fid, "canonical_file_id": canon})

    return joined.map_batches(finalize, batch_format="pyarrow")
