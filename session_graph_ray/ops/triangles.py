"""Distributed triangle enumeration / counting.

Public-method pedigree: degree-ordered edge orientation (Suri &
Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
WWW 2011): orient every undirected edge from its lower-(degree, id)
endpoint to the higher one. Each triangle then has exactly ONE node with
two out-edges (the wedge apex), so enumerating per-node out-neighbor pairs
and probing them against the edge set finds every triangle exactly once —
and out-degrees are bounded by O(sqrt(m)), so the wedge blow-up of a hot
vertex (the "last reducer") is structurally capped: a degree-10^6 hub that
would generate 10^12 wedges unoriented generates at most m wedges total.

Ray-Data plan (ids must fit in 31 bits — packed (a << 31) | b edge keys
ride the int64-native exchange layer):
  1. canonicalize + DISTINCT undirected edges via one bucketed np.unique
     census over packed keys;
  2. degree census (one more bucketed count over both endpoints);
  3. degrees attach to edges size-gated: driver-broadcast sorted
     (node, deg) arrays + searchsorted under the gate, two bucketed joins
     above it;
  4. wedges: groupby apex (one exchange); per-group pair expansion is pure
     segmented numpy (no per-node Python) — each element pairs with every
     earlier element of its segment via repeat/arange index algebra;
  5. wedge (lo, hi) keys probe the distinct edge set with the shared
     size-gated int semi-join; survivors ARE the triangles.

Output: one row per triangle, ids sorted (a < b < c).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .spandedup import BROADCAST_MAX_KEYS, _semi_join_int

_C = np.int64(1) << 31


def _canonical_edges(edges: "rd.Dataset", src: str, dst: str,
                     num_buckets: int = 64) -> "rd.Dataset":
    """DISTINCT undirected (a < b) edges as packed int64 keys."""

    def pack(t: pa.Table) -> pa.Table:
        s = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) and (max(s.max(initial=0), d.max(initial=0)) >= _C
                       or min(s.min(initial=0), d.min(initial=0)) < 0):
            raise ValueError("node ids must fit in 31 bits")
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        key = np.unique(a * _C + b)
        return pa.table({"ek": pa.array(key),
                         "__bkt": pa.array(
                             (key % num_buckets).astype(np.int32))})

    def distinct(g: pa.Table) -> pa.Table:
        return pa.table({"ek": pa.array(
            np.unique(g["ek"].to_numpy(zero_copy_only=False)))})

    return (edges.map_batches(pack, batch_format="pyarrow",
                              batch_size=65536)
            .groupby("__bkt").map_groups(distinct, batch_format="pyarrow"))


def enumerate_triangles(
    edges: "rd.Dataset",
    src: str = "src",
    dst: str = "dst",
    broadcast_max: int = BROADCAST_MAX_KEYS,
) -> "rd.Dataset":
    """(a, b, c) per triangle, a < b < c, each triangle exactly once."""
    und = _canonical_edges(edges, src, dst).materialize()

    # degree census over both endpoints (one bucketed count)
    def ends(t: pa.Table) -> pa.Table:
        k = t["ek"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([k // _C, k % _C])
        return pa.table({"node": pa.array(nodes),
                         "__bkt": pa.array((nodes % 64).astype(np.int32))})

    def dcount(g: pa.Table) -> pa.Table:
        v, c = np.unique(g["node"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"node": pa.array(v),
                         "deg": pa.array(c.astype(np.int64))})

    deg = (und.map_batches(ends, batch_format="pyarrow")
           .groupby("__bkt").map_groups(dcount, batch_format="pyarrow")
           .materialize())

    if deg.count() <= broadcast_max:
        import ray

        ddf = deg.to_pandas()
        order = np.argsort(ddf["node"].to_numpy())
        dref = ray.put((ddf["node"].to_numpy()[order],
                        ddf["deg"].to_numpy()[order]))

        def orient(t: pa.Table) -> pa.Table:
            nodes, degs = ray.get(dref)
            k = t["ek"].to_numpy(zero_copy_only=False)
            a, b = k // _C, k % _C
            da = degs[np.searchsorted(nodes, a)]
            db = degs[np.searchsorted(nodes, b)]
            # orient from lower (deg, id); a < b already breaks deg ties
            a_first = (da < db) | (da == db)
            u = np.where(a_first, a, b)
            v = np.where(a_first, b, a)
            return pa.table({"u": pa.array(u), "v": pa.array(v),
                             "__bkt": pa.array((u % 64).astype(np.int32))})

        oriented = und.map_batches(orient, batch_format="pyarrow")
    else:
        from .join import bucket_join

        def unpacked(t: pa.Table) -> pa.Table:
            k = t["ek"].to_numpy(zero_copy_only=False)
            return pa.table({"a": pa.array(k // _C), "b": pa.array(k % _C)})

        ab = und.map_batches(unpacked, batch_format="pyarrow")
        j1 = bucket_join(ab, deg, left_on="a", right_on="node",
                         left_schema=pa.schema([("a", pa.int64()),
                                                ("b", pa.int64())]),
                         right_schema=pa.schema([("node", pa.int64()),
                                                 ("deg", pa.int64())]))

        def rn1(t: pa.Table) -> pa.Table:
            return pa.table({"a": t["a"], "b": t["b"], "da": t["deg"]})

        j1 = j1.map_batches(rn1, batch_format="pyarrow")
        j2 = bucket_join(j1, deg, left_on="b", right_on="node",
                         left_schema=pa.schema([("a", pa.int64()),
                                                ("b", pa.int64()),
                                                ("da", pa.int64())]),
                         right_schema=pa.schema([("node", pa.int64()),
                                                 ("deg", pa.int64())]))

        def orient2(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            da = t["da"].to_numpy(zero_copy_only=False)
            db = t["deg"].to_numpy(zero_copy_only=False)
            a_first = (da < db) | (da == db)
            u = np.where(a_first, a, b)
            v = np.where(a_first, b, a)
            return pa.table({"u": pa.array(u), "v": pa.array(v),
                             "__bkt": pa.array((u % 64).astype(np.int32))})

        oriented = j2.map_batches(orient2, batch_format="pyarrow")

    # wedges per apex: segmented pair expansion, no per-node Python
    def wedges(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, len(u)])
        # in-segment index i: element pairs with its i earlier neighbors
        idx = np.arange(len(u), dtype=np.int64) - np.repeat(starts, counts)
        total = int(idx.sum())
        if total == 0:
            return pa.table({"apex": pa.array([], pa.int64()),
                             "wk": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        seg_start = np.repeat(starts, counts)
        offs = np.cumsum(idx) - idx
        first_idx = (np.repeat(seg_start, idx)
                     + (np.arange(total, dtype=np.int64)
                        - np.repeat(offs, idx)))
        second = np.repeat(v, idx)
        first = v[first_idx]
        lo = np.minimum(first, second)
        hi = np.maximum(first, second)
        return pa.table({"apex": pa.array(np.repeat(u, idx)),
                         "wk": pa.array(lo * _C + hi),
                         "lo": pa.array(lo), "hi": pa.array(hi)})

    wedge_ds = oriented.groupby("__bkt").map_groups(wedges,
                                                    batch_format="pyarrow")
    hits = _semi_join_int(
        wedge_ds, und, "wk", "ek",
        occ_schema=pa.schema([("apex", pa.int64()), ("wk", pa.int64()),
                              ("lo", pa.int64()), ("hi", pa.int64())]),
        broadcast_max=broadcast_max,
    )

    def finish(t: pa.Table) -> pa.Table:
        apex = t["apex"].to_numpy(zero_copy_only=False)
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        a = np.minimum(apex, lo)
        c = np.maximum(apex, hi)
        b = apex + lo + hi - a - c
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "c": pa.array(c)})

    return hits.map_batches(finish, batch_format="pyarrow")


def triangle_count(edges: "rd.Dataset", src: str = "src",
                   dst: str = "dst") -> "rd.Dataset":
    """Single-row (n_triangles) global count."""
    from ray.data.aggregate import Sum

    tri = enumerate_triangles(edges, src, dst)

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    total = (tri.map_batches(ones, batch_format="pyarrow")
             .aggregate(Sum("n", alias_name="n_triangles")))
    return rd.from_arrow(pa.table({
        "n_triangles": pa.array([int(total["n_triangles"] or 0)],
                                pa.int64())}))
