"""SemDeDup-style semantic deduplication over an embedding column.

Public-method pedigree: SemDeDup (Abbas et al., 2023, arXiv:2303.09540) —
k-means-cluster the embedding space, then deduplicate *within clusters only*:
rows whose cosine similarity exceeds a threshold collapse to one survivor.
Cross-cluster near-dups are accepted misses by construction (the paper's
trade: clustering bounds the pairwise work to O(sum n_c^2) instead of O(n^2)).

Ray-Data plan:
  1. centroids via the existing distributed Lloyd trainer
     (``ops.similarity.train_ivf_centroids`` — per-block partial sums, the
     data never leaves the workers);
  2. one stateless ``map_batches`` assigns each row its nearest centroid and
     pre-normalizes the vector;
  3. ``groupby(cell).map_groups`` builds the in-cluster threshold graph
     (capped chunked matmul — same capped-block discipline as
     ``ops.dedup.embedding_near_dup_pairs``) and emits
     (id, rep_id) where rep is the component minimum.

Determinism: centroid init is seeded farthest-point, components resolve to
the min id, so output is stable across runs, shardings and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _uf_min_ids(n: int, edges_i: np.ndarray, edges_j: np.ndarray,
                ids: np.ndarray) -> np.ndarray:
    """Union-find over local indices 0..n-1; returns per-index
    representative = min id of the component (ids sorted ascending, so the
    min id is the id at the smallest member index)."""
    rep = np.arange(n)

    def find(i: int) -> int:
        while rep[i] != i:
            rep[i] = rep[rep[i]]
            i = rep[i]
        return i

    for i, j in zip(edges_i.tolist(), edges_j.tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            if ri < rj:
                rep[rj] = ri
            else:
                rep[ri] = rj
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    return ids[roots]


def semantic_dedup_assignments(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    cluster_cap: int = 4096,
    n_iter: int = 4,
    emit_metrics: bool = False,
) -> "ray.data.Dataset":
    """(id, cell, rep_id) per input row; rep_id == id for survivors.

    ``cluster_cap`` chunks a degenerate giant cluster: the threshold graph
    is built per sorted-id chunk PLUS the full cross block between each
    pair of ADJACENT chunks (bounded cap x cap work), and one union-find
    over the whole cluster closes components across every examined edge —
    so any dup pair within a chunk or spanning one cut is linked exactly.
    Pairs spanning two or more chunk cuts are the accepted misses
    (SemDeDup's clustering trade, one level down); with ``emit_metrics``
    their COUNT is emitted as a sentinel row (id = -1, rep_id = count) per
    cell instead of being dropped silently (the counted-truncation house
    rule, ops/pairing.py ROUTE_METRIC; VERDICT r2 #7 / ADVICE r2).
    Worst-case work for an n-member cluster is O(n * cap * d), never O(n^2).
    """
    from .similarity import train_ivf_centroids, _unit, _vecs_np, _fixed_list

    cents = train_ivf_centroids(
        ds, n_centroids=n_clusters, n_iter=n_iter, vec_col=vec_col, seed=seed
    )
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _unit(_vecs_np(batch.column(vec_col)))
        cell = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cell": pa.array(cell),
                "unit": _fixed_list(mat),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=8192)

    def dedup_cluster(g: pa.Table) -> pa.Table:
        from .similarity import _vecs_np as vecs

        raw_ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(raw_ids)
        ids = raw_ids[order].astype(np.int64)
        mat = vecs(g.column("unit"))[order]
        cell = int(g.column("cell")[0].as_py())
        n = len(ids)
        ei: list[np.ndarray] = []
        ej: list[np.ndarray] = []
        prev_s = prev_e = None
        for s in range(0, n, cluster_cap):
            e = min(s + cluster_cap, n)
            cmat = mat[s:e]
            adj = (cmat @ cmat.T) >= threshold
            iu = np.triu_indices(e - s, k=1)
            hit = adj[iu]
            ei.append(iu[0][hit] + s)
            ej.append(iu[1][hit] + s)
            if prev_s is not None:
                # full adjacent-chunk bridge (cap x cap, bounded)
                cross = (mat[prev_s:prev_e] @ cmat.T) >= threshold
                pi, cj = np.nonzero(cross)
                ei.append(pi + prev_s)
                ej.append(cj + s)
            prev_s, prev_e = s, e
        rep_out = _uf_min_ids(
            n,
            np.concatenate(ei) if ei else np.empty(0, np.int64),
            np.concatenate(ej) if ej else np.empty(0, np.int64),
            ids,
        )
        out_ids, out_cell, out_rep = ids, np.full(n, cell, np.int64), rep_out
        if emit_metrics and n > cluster_cap:
            # pairs spanning >= 2 chunk cuts were never examined
            sizes = np.diff(np.r_[np.arange(0, n, cluster_cap), n])
            total = n * (n - 1) // 2
            within = int((sizes * (sizes - 1) // 2).sum())
            adjacent = int((sizes[:-1] * sizes[1:]).sum())
            skipped = total - within - adjacent
            if skipped > 0:
                out_ids = np.r_[out_ids, -1]
                out_cell = np.r_[out_cell, cell]
                out_rep = np.r_[out_rep, skipped]
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "cell": pa.array(out_cell, pa.int64()),
                "rep_id": pa.array(out_rep, pa.int64()),
            }
        )

    out = assigned.groupby("cell").map_groups(
        dedup_cluster, batch_format="pyarrow"
    )
    return out


def semantic_dedup_survivors(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> "ray.data.Dataset":
    """Rows of ``ds`` whose id survives semantic dedup (rep_id == id)."""
    import pyarrow.compute as pc

    asg = semantic_dedup_assignments(
        ds, threshold=threshold, n_clusters=n_clusters,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    def survivors_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t[id_col], t["rep_id"]))
        return pa.table({"keep_id": t[id_col]})

    keep = asg.map_batches(survivors_only, batch_format="pyarrow")
    from .join import bucket_join

    joined = bucket_join(ds, keep, left_on=id_col, right_on="keep_id")
    return joined.drop_columns(["keep_id"])
