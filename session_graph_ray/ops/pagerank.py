"""Distributed PageRank over an int64 edge table — iterative power
iteration expressed as bucketed hash exchanges, zero driver-side graph
state.

Integer semantics (exact, order-independent, SQL-mirrorable): ranks are
micro-units (r0 = SCALE_U = 1_000_000 per node) and every iteration is

    r'(v) = (SCALE_U - damping_u)
            + sum over in-edges (u, v) of  (damping_u * r(u)) // (SCALE_U * outdeg(u))

with int64 floor division, so partial sums commute (integer addition) and
the result is bit-equal across any partitioning — the same property every
other value-hashed kernel in this repo relies on. Dangling mass and
contributions to ids absent from the node table are dropped on both the
Ray and the SQL side (the oracle's LEFT JOIN from ``nodes``).

Scale shape (the 100-TB story): the graph never lands on the driver.

- ``outdeg`` attach is ONE exchange of the edge table keyed by ``src % B``
  (per-bucket lexsort + run-length repeat — no join needed).
- Each iteration is TWO exchanges of compact int64 tables: (1) a tagged
  union of degree-annotated edges and the current rank table colocated on
  ``src % B`` / ``node % B``, joined per bucket via ``np.searchsorted``,
  emitting (dst, contrib) plus a (node, 0) membership pass-through; (2) a
  sum-reduce on ``node % B`` that also enforces membership (keys with no
  pass-through row — ghost dsts — are dropped).  Both inherit
  ``ops.exchange``'s byte-gated fallback to Ray's streaming sort shuffle.
- The rank table is materialized once per iteration (it is the loop-carried
  dependency; O(#nodes) compact int rows, never content), cutting lineage
  the same way ``stages/clustering.propagate_labels`` does.

Reference analog: none — the reference's only graph computation is the
single-process entity-merge walk (``/root/reference/pipeline/
link_entities.py:857-879``); PageRank is the canonical "iterative
distributed aggregate" this engine adds for corpus-quality weighting
(e.g. page importance as a training-data quality prior).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import ERConfig

SCALE_U = 1_000_000

_EDGE_DEG_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("deg", pa.int64())]
)
_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("rank_u", pa.int64())])
# tagged-union row for the join exchange: edge rows carry (k=src, dst, deg),
# rank rows carry (k=node, rank_u); `m` marks rank rows (membership)
_UNION_SCHEMA = pa.schema(
    [
        ("k", pa.int64()),
        ("dst", pa.int64()),
        ("deg", pa.int64()),
        ("rank_u", pa.int64()),
        ("m", pa.int8()),
    ]
)
_CONTRIB_SCHEMA = pa.schema(
    [("node", pa.int64()), ("c", pa.int64()), ("m", pa.int8())]
)


def _k_bucket(col: str, B: int):
    def f(t: pa.Table) -> np.ndarray:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (v % np.uint64(B)).astype(np.int64)

    return f


def attach_out_degree(
    edges: "ray.data.Dataset", B: int
) -> "ray.data.Dataset":
    """(src, dst) -> (src, dst, deg) with deg = out-degree of src; one
    exchange keyed on ``src % B``, per-bucket lexsort + run-length repeat."""
    from .exchange import exchange_map_groups

    def kernel(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = g.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        runs = np.diff(np.r_[starts, len(src)])
        deg = np.repeat(runs, runs)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "deg": pa.array(deg.astype(np.int64), pa.int64()),
            }
        )

    return exchange_map_groups(
        edges, kernel, None, B, _EDGE_DEG_SCHEMA.empty_table(),
        bucket_fn=_k_bucket("src", B),
    )


def pagerank(
    edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    num_iters: int = 3,
    damping_u: int = 850_000,
    cfg: ERConfig | None = None,
) -> "ray.data.Dataset":
    """``num_iters`` rounds of integer power iteration.

    ``edges``: columns (src:int64, dst:int64). ``nodes``: column
    (node:int64) — the membership table; ranks are emitted exactly for
    these ids. Returns (node, rank_u) with rank_u in micro-units.
    """
    cfg = cfg or ERConfig()
    B = cfg.hash_buckets
    base_u = SCALE_U - damping_u

    from .exchange import exchange_map_groups

    edeg = attach_out_degree(edges, B).materialize()

    def edge_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("src"),
                "dst": t.column("dst"),
                "deg": t.column("deg"),
                "rank_u": pa.nulls(n, pa.int64()),
                "m": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def rank_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("node"),
                "dst": pa.nulls(n, pa.int64()),
                "deg": pa.nulls(n, pa.int64()),
                "rank_u": t.column("rank_u"),
                "m": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def join_contrib(g: pa.Table) -> pa.Table:
        """One colocated bucket union: look up r(src) for every edge row via
        searchsorted into the (sorted) rank rows; emit (dst, contrib) plus
        the (node, 0, m=1) membership pass-through."""
        m = g.column("m").to_numpy(zero_copy_only=False)
        k = g.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        is_rank = m == 1
        rk = k[is_rank]
        rv = g.column("rank_u").to_numpy(zero_copy_only=False)[is_rank].astype(
            np.int64
        )
        order = np.argsort(rk, kind="stable")
        rk, rv = rk[order], rv[order]
        ek = k[~is_rank]
        edst = g.column("dst").to_numpy(zero_copy_only=False)[~is_rank].astype(
            np.int64
        )
        edeg_ = g.column("deg").to_numpy(zero_copy_only=False)[~is_rank].astype(
            np.int64
        )
        if len(rk):
            idx = np.searchsorted(rk, ek)
            # srcs are corpus ids by construction; mask defensively anyway
            # so a caller with ghost srcs degrades to "no contribution"
            ok = (idx < len(rk)) & (rk[np.minimum(idx, len(rk) - 1)] == ek)
        else:
            idx = np.zeros(len(ek), dtype=np.int64)
            ok = np.zeros(len(ek), dtype=bool)
        idx, edst, edeg_ = idx[ok], edst[ok], edeg_[ok]
        contrib = (np.int64(damping_u) * rv[idx]) // (
            np.int64(SCALE_U) * edeg_
        )
        node = np.concatenate([edst, rk])
        c = np.concatenate([contrib, np.zeros(len(rk), dtype=np.int64)])
        mm = np.concatenate(
            [np.zeros(len(edst), dtype=np.int8), np.ones(len(rk), dtype=np.int8)]
        )
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "m": pa.array(mm, pa.int8()),
            }
        )

    def sum_ranks(g: pa.Table) -> pa.Table:
        """base + sum(contrib) per node, membership-gated: keys with no
        pass-through row (ghost dsts outside the node table) are dropped —
        the LEFT-JOIN-from-nodes semantics of the SQL oracle."""
        if g.num_rows == 0:
            return _RANK_SCHEMA.empty_table()
        node = g.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        m = g.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(node, kind="stable")
        node, c, m = node[order], c[order], m[order]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        csum = np.add.reduceat(c, starts) if len(node) else np.empty(0, np.int64)
        member = (
            np.add.reduceat(m, starts) > 0 if len(node) else np.empty(0, bool)
        )
        out_node = node[starts][member]
        out_r = (np.int64(base_u) + csum[member]).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(out_node, pa.int64()),
                "rank_u": pa.array(out_r, pa.int64()),
            }
        )

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "rank_u": pa.array(
                    np.full(t.num_rows, SCALE_U, dtype=np.int64), pa.int64()
                ),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    for _ in range(num_iters):
        tagged = edeg.map_batches(
            edge_tag, batch_format="pyarrow"
        ).union(ranks.map_batches(rank_tag, batch_format="pyarrow"))
        contribs = exchange_map_groups(
            tagged, join_contrib, None, B, _CONTRIB_SCHEMA.empty_table(),
            bucket_fn=_k_bucket("k", B),
        )
        ranks = exchange_map_groups(
            contribs, sum_ranks, None, B, _RANK_SCHEMA.empty_table(),
            bucket_fn=_k_bucket("node", B),
        ).materialize()

    return ranks
