"""Sorted-neighborhood blocking (ops/snm.py) vs a brute-force reference."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _brute_pairs(order, ids, window):
    idx = np.lexsort((ids, order))
    o, i = order[idx], ids[idx]
    out = []
    n = len(i)
    for a in range(n):
        for b in range(a + 1, min(a + window, n)):
            out.append((int(i[a]), int(i[b]), b - a))
    return sorted(out)


def _run(order, ids, window, blocks=7):
    from session_graph_ray.ops.snm import snm_pairs

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "n": pa.array(order, pa.int64())})
    ).repartition(blocks)
    res = snm_pairs(ds, order_col="n", id_col="doc_id", window=window,
                    id_a="a", id_b="b", dist_col="d").to_pandas()
    return sorted(zip(res["a"], res["b"], res["d"]))


def test_snm_matches_bruteforce_with_ties():
    rng = np.random.RandomState(7)
    n = 400
    order = rng.randint(0, 25, size=n).astype(np.int64)  # heavy ties
    ids = rng.permutation(n).astype(np.int64)
    assert _run(order, ids, window=8) == _brute_pairs(order, ids, 8)


def test_snm_wide_value_range_and_small_window():
    rng = np.random.RandomState(11)
    n = 300
    order = rng.randint(0, 2**30, size=n).astype(np.int64)
    ids = (rng.permutation(n) + 1000).astype(np.int64)
    assert _run(order, ids, window=2) == _brute_pairs(order, ids, 2)


def test_snm_window_larger_than_corpus():
    order = np.array([5, 1, 3], dtype=np.int64)
    ids = np.array([10, 20, 30], dtype=np.int64)
    # window 10 > n: every pair, distances by sorted position
    assert _run(order, ids, window=10, blocks=2) == _brute_pairs(
        order, ids, 10)


def test_snm_rejects_bad_window():
    from session_graph_ray.ops.snm import snm_pairs

    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                       "n": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        snm_pairs(ds, "n", "doc_id", window=1)


def test_global_rank_dense_and_exact():
    from session_graph_ray.ops.snm import global_rank

    rng = np.random.RandomState(3)
    n = 500
    order = rng.randint(0, 10, size=n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"i": pa.array(ids, pa.int64()),
                  "o": pa.array(order, pa.int64())})
    ).repartition(5)
    got = global_rank(ds, "o", "i", out_col="r").to_pandas()
    got = got.sort_values("i").reset_index(drop=True)
    want = np.empty(n, dtype=np.int64)
    want[np.lexsort((ids, order))] = np.arange(n)
    ref = {int(i): int(want[k]) for k, i in enumerate(ids)}
    assert all(ref[int(i)] == int(r) for i, r in zip(got["i"], got["r"]))
