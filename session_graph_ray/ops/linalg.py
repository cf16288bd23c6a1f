"""Distributed linear algebra over embedding columns: PCA / whitening.

The embedding-preprocessing step vision/text curation pipelines run before
clustering-based dedup or IVF/PQ indexing (decorrelated, variance-ordered
axes make k-means cells and PQ subspaces much more balanced — the same
motivation as OPQ's rotation). Public method: plain covariance PCA.

Ray-Data plan: ONE pass of constant-size partials — every block ships
(sum_vec [d], sum_outer [d*d], count), reduced on the driver where the
(d x d) eigendecomposition is exact numpy `eigh` (a d=4096 covariance is
128 MB — driver-trivial at any corpus size; the corpus itself never
moves). Projection is one broadcast matmul per batch. Partial float64
sums commute up to IEEE rounding; the pytest pins subspace agreement with
single-process numpy PCA, not bit equality (the honest contract for a
float reduction — the exact-integer contract used elsewhere would
overflow int64 on the outer-product sums).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import _fixed_list, _vecs_np


def embedding_pca(
    ds: "ray.data.Dataset",
    n_components: int,
    vec_col: str = "embedding",
) -> dict:
    """Fit PCA: returns {"mean": (d,), "components": (k, d) rows =
    top eigenvectors by descending eigenvalue, "explained_var": (k,),
    "total_var": float}. Deterministic up to IEEE summation order; sign
    convention: each component's largest-|coord| entry is positive."""

    def partial(t: pa.Table) -> pa.Table:
        m = _vecs_np(t.column(vec_col))
        if m.size == 0:
            return pa.table({"p": pa.array([], pa.binary())})
        d = m.shape[1]
        buf = np.concatenate([
            m.sum(axis=0), (m.T @ m).ravel(),
            np.array([float(m.shape[0])]),
        ])
        return pa.table({"p": pa.array([buf.tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=8192).take_all()
    acc = None
    for r in rows:
        v = np.frombuffer(r["p"], dtype=np.float64)
        acc = v.copy() if acc is None else acc + v
    if acc is None:
        raise ValueError("empty dataset")
    d = int((-1 + np.sqrt(1 + 4 * (len(acc) - 1))) // 2)
    s = acc[:d]
    outer = acc[d:d + d * d].reshape(d, d)
    n = acc[-1]
    mean = s / n
    cov = outer / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: largest-|coord| entry positive
    flips = np.sign(comps[np.arange(len(comps)),
                          np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    return {
        "mean": mean,
        "components": comps,
        "explained_var": evals[order],
        "total_var": float(evals.sum()),
    }


def pca_project(
    ds: "ray.data.Dataset",
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
    whiten: bool = False,
) -> "ray.data.Dataset":
    """(id_col, out_col): each vector centered and projected onto the
    fitted components (optionally variance-whitened); one broadcast
    matmul per batch, output a FixedSizeList<double>[k] column."""
    comps = np.asarray(model["components"], dtype=np.float64)
    mean = np.asarray(model["mean"], dtype=np.float64)
    scale = (1.0 / np.sqrt(np.maximum(model["explained_var"], 1e-12))
             if whiten else np.ones(len(comps)))
    ref = ray.put((comps, mean, scale))

    def project(t: pa.Table) -> pa.Table:
        c, mu, sc = ray.get(ref)
        m = _vecs_np(t.column(vec_col))
        proj = (m - mu) @ c.T * sc
        return pa.table({
            id_col: pa.compute.cast(t.column(id_col), pa.int64()),
            out_col: _fixed_list(proj),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          batch_size=8192)
