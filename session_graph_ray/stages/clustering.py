"""Stage 3 — transitive clustering: distributed union-find over match edges.

Reference semantic: entities sharing a canonical key merge under one
representative (same-QID => ``owl:sameAs``,
``/root/reference/pipeline/link_entities.py:741-754``). The reference elects
``uris[0]`` — list-order dependent; here the canonical id is ``min(file_id)``
so the output is order-free (SURVEY.md §2.11 note).

Algorithm: hash-partitioned min-label propagation to fixpoint — no driver-side
union-find state (north_rule). Per round, entirely in Ray Data:

    msgs      = edges ⋈ labels(on id_a) -> (id_b, label_a)
              ∪ edges ⋈ labels(on id_b) -> (id_a, label_b)
              ∪ labels
    labels'   = msgs.groupby(node).min(label)
    converged = checksum(labels') == checksum(labels)   (crc32 sum — scalar)

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

    ``checkpoint_cb(round_idx, labels_ds)`` is invoked per round when given
    (per-round lineage checkpointing hook)."""
    edges = edges.select_columns(["id_a", "id_b"]).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a")
        b = batch.column("id_b")
        node = pa.concat_arrays([a.combine_chunks(), b.combine_chunks()])
        return pa.table({"node": node, "label": node})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    prev_sum = _label_checksum(labels)
    for rnd in range(cfg.max_cluster_rounds):
        la = labels.rename_columns({"node": "node_a", "label": "label_a"})
        lb = labels.rename_columns({"node": "node_b", "label": "label_b"})
        m1 = (
            edges.join(la, join_type="inner", num_partitions=cfg.join_partitions,
                       on=("id_a",), right_on=("node_a",))
            .select_columns(["id_b", "label_a"])
            .rename_columns({"id_b": "node", "label_a": "label"})
        )
        m2 = (
            edges.join(lb, join_type="inner", num_partitions=cfg.join_partitions,
                       on=("id_b",), right_on=("node_b",))
            .select_columns(["id_a", "label_b"])
            .rename_columns({"id_a": "node", "label_b": "label"})
        )
        new_labels = (
            m1.union(m2)
            .union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
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
    lab = labels.rename_columns({"node": "file_id_l", "label": "canonical"})
    joined = corpus_ids.select_columns(["file_id"]).join(
        lab,
        join_type="left_outer",
        num_partitions=cfg.join_partitions,
        on=("file_id",),
        right_on=("file_id_l",),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        fid = batch.column("file_id")
        canon = batch.column("canonical")
        canon = pc.coalesce(canon, fid)
        return pa.table({"file_id": fid, "canonical_file_id": canon})

    return joined.map_batches(finalize, batch_format="pyarrow")
