"""Skew-aware equi-join (ops/skewjoin.py): exactness under planted hot
keys, both-route coverage, no-skew passthrough, and the broadcast cap."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from session_graph_ray.ops.skewjoin import detect_heavy_keys, skew_join

LS = pa.schema([("k", pa.int64()), ("v", pa.int64())])
RS = pa.schema([("rk", pa.int64()), ("tag", pa.string())])


def _skewed(seed=1, n=30_000, n_keys=500, n_hot=3):
    """~half the probe rows concentrated on n_hot keys, rest uniform."""
    rng = np.random.RandomState(seed)
    cold = rng.randint(n_hot, n_keys, n)
    hot = rng.randint(0, n_hot, n)
    take_hot = rng.rand(n) < 0.5
    k = np.where(take_hot, hot, cold)
    left = pd.DataFrame({"k": k, "v": rng.randint(0, 100, n)})
    # build side: one row per key for 80% of keys (some probe keys unmatched)
    keys = np.arange(0, int(n_keys * 0.8))
    right = pd.DataFrame({"rk": keys, "tag": [f"t{i}" for i in keys]})
    return left, right


def _expected(left, right, how):
    out = left.merge(right, how=how, left_on="k", right_on="rk")
    return out.sort_values(["k", "v", "rk"], na_position="last").reset_index(
        drop=True
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_join_exact_with_hot_keys(how):
    left, right = _skewed()
    metrics = {}
    out = (
        skew_join(
            rd.from_pandas(left).repartition(8),
            rd.from_pandas(right).repartition(3),
            "k", "rk", left_schema=LS, right_schema=RS,
            how=how, heavy_min_rows=1000, route_metrics=metrics,
        )
        .to_pandas()
        .sort_values(["k", "v", "rk"], na_position="last")
        .reset_index(drop=True)
    )
    # the hot keys actually routed through the broadcast path
    assert metrics["n_heavy_keys"] == 3
    assert metrics["n_broadcast_rows"] == 3
    pd.testing.assert_frame_equal(
        out, _expected(left, right, how), check_dtype=False
    )


def test_skew_join_no_skew_is_pure_bucket_path():
    rng = np.random.RandomState(2)
    left = pd.DataFrame({"k": rng.permutation(2000), "v": np.arange(2000)})
    right = pd.DataFrame({"rk": np.arange(1500), "tag": "x"})
    metrics = {}
    out = skew_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", "rk", left_schema=LS, right_schema=RS,
        heavy_min_rows=100, route_metrics=metrics,
    ).to_pandas()
    assert metrics["n_heavy_keys"] == 0
    assert len(out) == 1500


def test_skew_join_broadcast_cap_raises():
    """A build side that is itself skewed on a heavy probe key must raise,
    not silently broadcast an unbounded frame."""
    left = pd.DataFrame({"k": np.zeros(5000, np.int64), "v": np.arange(5000)})
    right = pd.DataFrame(
        {"rk": np.zeros(200, np.int64), "tag": [f"t{i}" for i in range(200)]}
    )
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        skew_join(
            rd.from_pandas(left), rd.from_pandas(right),
            "k", "rk", left_schema=LS, right_schema=RS,
            heavy_min_rows=1000, max_broadcast_rows=100,
        )


def test_detect_heavy_keys_sound():
    left, _ = _skewed()
    ds = rd.from_pandas(left).repartition(5)
    heavy = set(detect_heavy_keys(ds, "k", heavy_min_rows=1000).tolist())
    true_counts = left["k"].value_counts()
    assert heavy == set(true_counts[true_counts >= 1000].index)
