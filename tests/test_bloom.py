"""Bloom semi/anti-join prefilter (ops/bloom.py): exactness independent of
filter density, string keys, null handling, and actual pruning power."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from session_graph_ray.ops.bloom import (
    _might_match_mask,
    bloom_semi_join,
    build_bloom,
)


def _frames(seed=0, n_left=5000, n_right=800):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 4000, n_left),
            "payload": rng.randint(0, 10, n_left),
        }
    )
    # right keys overlap ~half the left key range
    right = pd.DataFrame({"rk": rng.randint(2000, 6000, n_right)})
    return left, right


LEFT_SCHEMA = pa.schema([("k", pa.int64()), ("payload", pa.int64())])


def _expected(left, right, anti):
    inset = left["k"].isin(set(right["rk"]))
    out = left[~inset] if anti else left[inset]
    return out.sort_values(["k", "payload"]).reset_index(drop=True)


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("n_bits", [1 << 20, 256])  # 256 bits => dense fp
def test_bloom_join_exact_at_any_density(anti, n_bits):
    """The exact-join residue must erase Bloom false positives: even a
    256-bit filter (nearly every probe row a 'maybe') yields exact rows."""
    left, right = _frames()
    out = (
        bloom_semi_join(
            rd.from_pandas(left).repartition(6),
            rd.from_pandas(right).repartition(4),
            "k", "rk", left_schema=LEFT_SCHEMA,
            n_bits=n_bits, anti=anti,
        )
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _expected(left, right, anti), check_dtype=False)


def test_bloom_string_keys():
    left = pd.DataFrame({"k": [f"u{i}" for i in range(400)], "payload": range(400)})
    right = pd.DataFrame({"rk": [f"u{i}" for i in range(0, 400, 3)]})
    schema = pa.schema([("k", pa.string()), ("payload", pa.int64())])
    out = bloom_semi_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(2),
        "k", "rk", left_schema=schema,
    ).to_pandas()
    assert sorted(out["k"]) == sorted(f"u{i}" for i in range(0, 400, 3))


def test_bloom_null_probe_keys_never_match():
    left = pd.DataFrame(
        {
            "k": pd.array([1, 2, None, 4, None], dtype="Int64"),
            "payload": [0, 1, 2, 3, 4],
        }
    )
    right = pd.DataFrame({"rk": [1, 4]})
    schema = pa.schema([("k", pa.int64()), ("payload", pa.int64())])
    semi = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
        left_schema=schema,
    ).to_pandas()
    assert sorted(semi["payload"]) == [0, 3]
    anti = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
        left_schema=schema, anti=True,
    ).to_pandas()
    # SQL NOT IN semantics would drop null-key rows entirely; this op uses
    # the engine-side convention (null matches nothing -> kept by anti)
    assert sorted(anti["payload"]) == [1, 2, 4]


def test_bloom_prunes_disjoint_probe_rows():
    """With disjoint key ranges, the broadcast bitmap alone must rule out
    (almost) every probe row — the property that saves the shuffle."""
    left, right = _frames()
    bm = build_bloom(rd.from_pandas(right), "rk", n_bits=1 << 20)
    disjoint = pa.chunked_array([pa.array(np.arange(100000, 101000))])
    mask = _might_match_mask(disjoint, ray.put(bm), 1 << 20, 4)
    assert mask.mean() < 0.02  # ~0 false-positive 'maybe' rows


def test_bloom_empty_result_counts_zero():
    """Empty anti result: count() is 0. (Known Ray quirk: a union whose
    every block is empty drops the schema in to_pandas — callers needing
    the schema of an empty result should consult left_schema.)"""
    left = pd.DataFrame({"k": [1, 2, 3], "payload": [1, 2, 3]})
    right = pd.DataFrame({"rk": [1, 2, 3]})
    out = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
        left_schema=LEFT_SCHEMA, anti=True,
    )
    assert out.count() == 0
