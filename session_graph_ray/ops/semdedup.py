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
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _components_min_label(ids: np.ndarray, adj: np.ndarray) -> np.ndarray:
    """Connected components of a boolean adjacency matrix; returns per-row
    representative = min id of the component. ids must be sorted ascending."""
    n = len(ids)
    rep = np.arange(n)

    def find(i: int) -> int:
        while rep[i] != i:
            rep[i] = rep[rep[i]]
            i = rep[i]
        return i

    rows, cols = np.nonzero(adj)
    for i, j in zip(rows.tolist(), cols.tolist()):
        if i < j:
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
) -> "ray.data.Dataset":
    """(id, cell, rep_id) per input row; rep_id == id for survivors.

    ``cluster_cap`` chunks a degenerate giant cluster: the threshold graph
    is built per sorted-id chunk plus a bridge row between adjacent chunks
    (first member of chunk k+1 checked against chunk k's members), so an
    oversized cluster degrades to bounded O(n * cap) work, never O(n^2).
    """
    from .similarity import train_ivf_centroids, _unit

    cents = train_ivf_centroids(
        ds, n_centroids=n_clusters, n_iter=n_iter, vec_col=vec_col, seed=seed
    )
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _unit(np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64))
        cell = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cell": pa.array(cell),
                "unit": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=8192)

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g[id_col].to_numpy())
        ids = g[id_col].to_numpy()[order].astype(np.int64)
        mat = np.asarray(g["unit"].tolist(), dtype=np.float64)[order]
        cell = int(g["cell"].iloc[0])
        n = len(ids)
        rep_out = np.empty(n, dtype=np.int64)
        prev_ids: np.ndarray | None = None
        prev_mat: np.ndarray | None = None
        prev_rep: np.ndarray | None = None
        for s in range(0, n, cluster_cap):
            cids = ids[s : s + cluster_cap]
            cmat = mat[s : s + cluster_cap]
            adj = (cmat @ cmat.T) >= threshold
            np.fill_diagonal(adj, False)
            rep = _components_min_label(cids, adj)
            if prev_ids is not None and len(cids):
                # bridge: chunk head vs ALL previous-chunk members — a dup
                # run spanning the cut inherits the earlier representative
                sims = prev_mat @ cmat[0]
                hit = np.nonzero(sims >= threshold)[0]
                if len(hit):
                    inherited = prev_rep[hit].min()
                    rep[rep == rep[0]] = min(inherited, rep[0])
            rep_out[s : s + cluster_cap] = rep
            prev_ids, prev_mat, prev_rep = cids, cmat, rep
        return pd.DataFrame({id_col: ids, "cell": cell, "rep_id": rep_out})

    out = assigned.groupby("cell").map_groups(dedup_cluster)
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
