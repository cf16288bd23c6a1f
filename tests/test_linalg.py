"""Distributed PCA (ops/linalg.py) vs single-process numpy."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.linalg import embedding_pca, pca_project


def _data(n=800, d=24, seed=4):
    rng = np.random.default_rng(seed)
    # planted 3-dim signal subspace + small isotropic noise
    basis = np.linalg.qr(rng.normal(size=(d, 3)))[0]
    z = rng.normal(size=(n, 3)) * np.array([10.0, 5.0, 2.0])
    x = z @ basis.T + 0.05 * rng.normal(size=(n, d)) + rng.normal(size=d)
    return x


def _ds(x, parts=5):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in x]),
    })).repartition(parts)


def test_pca_matches_numpy_reference():
    x = _data().astype(np.float32).astype(np.float64)  # storage dtype
    model = embedding_pca(_ds(x), n_components=3)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    ref = evecs[:, np.argsort(evals)[::-1][:3]].T
    # subspace agreement: |cos| of each component vs reference ~ 1
    for got, want in zip(model["components"], ref):
        assert abs(float(got @ want)) > 0.999
    assert np.allclose(model["mean"], x.mean(axis=0), atol=1e-8)
    # planted 3-dim signal dominates the spectrum
    assert model["explained_var"].sum() / model["total_var"] > 0.98


def test_pca_project_and_whiten():
    x = _data().astype(np.float32).astype(np.float64)
    ds = _ds(x, parts=3)
    model = embedding_pca(ds, n_components=3)
    out = (pca_project(ds, model, whiten=True)
           .to_pandas().sort_values("vec_id"))
    proj = np.asarray([np.asarray(v) for v in out.projected])
    assert proj.shape == (len(x), 3)
    # whitened projections have ~unit variance per axis
    assert np.allclose(proj.var(axis=0), 1.0, atol=0.05)
    # projection is centered
    assert np.allclose(proj.mean(axis=0), 0.0, atol=1e-6)


def test_pca_partition_stability():
    x = _data(seed=7).astype(np.float32).astype(np.float64)
    a = embedding_pca(_ds(x, parts=1), n_components=2)
    b = embedding_pca(_ds(x, parts=9), n_components=2)
    # float reductions across different partitionings agree to tolerance
    for ca, cb in zip(a["components"], b["components"]):
        assert abs(float(ca @ cb)) > 0.999999
    assert np.allclose(a["explained_var"], b["explained_var"], rtol=1e-9)
