"""ops/setops.key_set_op + ops/window.grouped_lag semantics."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from session_graph_ray.ops.setops import key_set_op
from session_graph_ray.ops.window import grouped_lag


def _ds(vals, col="k", parts=1):
    ds = rd.from_arrow(pa.table({col: pa.array(vals, pa.int64())}))
    return ds.repartition(parts) if parts > 1 else ds


def _setop(l, r, op, parts=1):
    out = key_set_op(_ds(l, parts=parts), _ds(r, parts=parts),
                     "k", "k", op).to_pandas()
    return set(out["key"].tolist())


def test_key_set_op_semantics(ray_session):
    l = [1, 1, 2, 3, 5, 5]
    r = [2, 2, 3, 4]
    assert _setop(l, r, "intersect") == {2, 3}
    assert _setop(l, r, "except") == {1, 5}
    assert _setop(l, r, "except_right") == {4}


def test_key_set_op_partition_independent(ray_session):
    rng = np.random.RandomState(3)
    l = rng.randint(0, 200, 500).tolist()
    r = rng.randint(100, 300, 500).tolist()
    for op in ("intersect", "except", "except_right"):
        assert _setop(l, r, op, parts=1) == _setop(l, r, op, parts=17)
    assert _setop(l, r, "intersect") == set(l) & set(r)
    assert _setop(l, r, "except") == set(l) - set(r)


def test_key_set_op_rejects_unknown_op(ray_session):
    with pytest.raises(ValueError):
        key_set_op(_ds([1]), _ds([2]), "k", "k", "union")


def _lag(rows, parts=1):
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "tb": pa.array([r[2] for r in rows], pa.int64()),
        "v": pa.array([r[3] for r in rows], pa.int64()),
    })
    schema = t.schema
    ds = rd.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = grouped_lag(ds, "k", "o", "tb", "v", schema,
                      out_col="pv").to_pandas()
    return {(int(r.k), int(r.o), int(r.tb)):
            (None if pd_isna(r.pv) else int(r.pv))
            for r in out.itertuples()}


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_grouped_lag_order_and_tiebreak(ray_session):
    rows = [
        (1, 10, 0, 100), (1, 10, 1, 200), (1, 5, 9, 300),  # ties on o=10
        (2, 1, 0, 7),
    ]
    got = _lag(rows)
    # key 1 order: (5,9)->None, (10,0)->300, (10,1)->100
    assert got[(1, 5, 9)] is None
    assert got[(1, 10, 0)] == 300
    assert got[(1, 10, 1)] == 100
    assert got[(2, 1, 0)] is None


def test_grouped_lag_partition_independent(ray_session):
    rng = np.random.RandomState(5)
    rows = [(int(rng.randint(0, 20)), int(rng.randint(0, 50)), i,
             int(rng.randint(-99, 99))) for i in range(300)]
    assert _lag(rows, parts=1) == _lag(rows, parts=11)
