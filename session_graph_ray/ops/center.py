"""CENTER clustering: greedy star clusters over a similarity graph.

Connected components (the transitive-closure default) over-merge through
chains of pairwise matches; CENTER clustering (Haveliwala, Gionis &
Indyk '00 — "star" clustering as used throughout the dedup literature)
is the precision-favoring alternative: processing nodes in ascending id
order, an unassigned node becomes a CENTER and claims its unassigned
neighbors; claimed nodes never start clusters. Every cluster is a star —
each member is DIRECTLY similar to its center, never merely transitively.

The center set is exactly the lexicographically-first maximal
independent set (a node is a center iff NO smaller-id neighbor is a
center), and a non-center joins its minimum-id adjacent center. The
sequential fold parallelizes without changing the answer
(Blelloch-Fineman-Shun SPAA'12: greedy-by-fixed-order MIS equals its
dependency-respecting parallel schedule):

    round: an undecided node with every smaller-id neighbor decided
    NON-center becomes a center; an undecided node with any smaller-id
    CENTER neighbor becomes a non-center.

Scale shape, honestly stated: the similarity EDGE set (the near-dup
pair list — 16-byte rows, orders of magnitude smaller than the corpus)
is gated by ``max_edges`` and the fixpoint runs as vectorized
numpy rounds inside ONE Ray task — the ``driver_cluster_max_edges``
fastpath precedent from ``stages/clustering.py``. Beyond the gate the
operator refuses loudly; the natural extension is per-round bucketed
status exchanges (the ``propagate_labels`` machinery), which chains
would still serialize over rounds. The ASSIGNMENT pass over the corpus
is fully streaming (one broadcast map; nodes never gather).

Reference analog: the reference links each mention DIRECTLY to its
chosen entity (``/root/reference/pipeline/link_entities.py:283-329``) —
star semantics, not transitive merge; this operator is that choice as a
clustering primitive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

_UNKNOWN, _CENTER, _NONCTR = np.int8(0), np.int8(1), np.int8(2)

_ASSIGN_SCHEMA = pa.schema(
    [("node", pa.int64()), ("center_id", pa.int64())]
)

# edge-table gate: 50M edges = ~800 MB of packed arrays in the solver
# task — within one worker's heap; past it, refuse loudly
MAX_EDGES = 50_000_000


@ray.remote
def _solve_centers(a: np.ndarray, b: np.ndarray):
    """Fixpoint of the dependency-respecting rounds (== the sequential
    ascending-id greedy), then the min-adjacent-center assignment map.
    Returns (nodes_with_assignment, their_center_ids) sorted by node."""
    if a.size == 0:
        e = np.empty(0, np.int64)
        return e, e
    uniq = np.unique(np.concatenate([a, b]))
    idx_a = np.searchsorted(uniq, a)
    idx_b = np.searchsorted(uniq, b)
    status = np.zeros(uniq.size, np.int8)
    for _ in range(uniq.size + 1):
        und = status == _UNKNOWN
        if not und.any():
            break
        center_nb = np.zeros(uniq.size, bool)
        np.logical_or.at(center_nb, idx_b, status[idx_a] == _CENTER)
        undecided_nb = np.zeros(uniq.size, bool)
        np.logical_or.at(undecided_nb, idx_b, status[idx_a] == _UNKNOWN)
        new_non = und & center_nb
        new_ctr = und & ~center_nb & ~undecided_nb
        status[new_non] = _NONCTR
        status[new_ctr] = _CENTER
    # assignment: min adjacent center per non-center; centers to self
    is_ca = status[idx_a] == _CENTER
    is_cb = status[idx_b] == _CENTER
    mem = np.concatenate([b[is_ca], a[is_cb]])
    ctr = np.concatenate([a[is_ca], b[is_cb]])
    order = np.lexsort((ctr, mem))
    mem, ctr = mem[order], ctr[order]
    first = (np.r_[True, mem[1:] != mem[:-1]] if mem.size
             else np.zeros(0, bool))
    mem_u, ctr_min = mem[first], ctr[first]
    cs = uniq[status == _CENTER]
    if cs.size:
        pos = np.clip(np.searchsorted(cs, mem_u), 0, cs.size - 1)
        not_center = cs[pos] != mem_u
    else:
        not_center = np.ones(mem_u.size, bool)
    amap_nodes = np.concatenate([cs, mem_u[not_center]])
    amap_ctrs = np.concatenate([cs, ctr_min[not_center]])
    order2 = np.argsort(amap_nodes)
    return amap_nodes[order2], amap_ctrs[order2]


def center_clustering(
    edges: "rd.Dataset",
    nodes: "rd.Dataset",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    node_col: str = "doc_id",
    max_edges: int = MAX_EDGES,
) -> "rd.Dataset":
    """(node, center_id) for every node in ``nodes``: centers map to
    themselves, non-centers to their minimum-id adjacent center,
    isolated nodes to themselves. ``edges`` rows must satisfy
    src < dst (both int64); duplicates are harmless."""

    def canon(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.schema.names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        a = t.column(src_col).to_numpy(zero_copy_only=False)
        b = t.column(dst_col).to_numpy(zero_copy_only=False)
        if a.size and (a >= b).any():
            raise ValueError("edges must satisfy src < dst")
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    e = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = e.count()
    if n_edges > max_edges:
        raise ValueError(
            f"{n_edges} edges exceed max_edges={max_edges}; "
            "the star-cluster solver is single-task by design "
            "(see module docstring)"
        )
    parts = [t for t in (ray.get(r) for r in e.to_arrow_refs())
             if t.num_rows]
    if parts:
        et = pa.concat_tables(parts).combine_chunks()
        a = et.column("a").to_numpy(zero_copy_only=False)
        b = et.column("b").to_numpy(zero_copy_only=False)
    else:
        a = b = np.empty(0, np.int64)
    amap_nodes, amap_ctrs = ray.get(
        _solve_centers.remote(np.ascontiguousarray(a),
                              np.ascontiguousarray(b))
    )
    ref = ray.put((amap_nodes, amap_ctrs))

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or node_col not in t.schema.names:
            return _ASSIGN_SCHEMA.empty_table()
        an, ac = ray.get(ref)
        v = t.column(node_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        out = v.copy()  # isolated nodes: own center
        if an.size:
            pos = np.clip(np.searchsorted(an, v), 0, an.size - 1)
            hit = an[pos] == v
            out[hit] = ac[pos[hit]]
        return pa.table({"node": pa.array(v),
                         "center_id": pa.array(out)})

    return nodes.select_columns([node_col]).map_batches(
        assign, batch_format="pyarrow"
    )
