"""Composite multi-column join keys (ops/join.composite_key)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from session_graph_ray.ops.join import bucket_join, composite_key


def test_composite_key_join_matches_pandas_two_key_merge():
    rng = np.random.RandomState(4)
    left = pd.DataFrame(
        {
            "a": rng.randint(0, 20, 3000),
            "b": rng.choice(["x", "y", "z"], 3000),
            "v": np.arange(3000),
        }
    )
    right = pd.DataFrame(
        {
            "ra": np.repeat(np.arange(20), 3),
            "rb": np.tile(["x", "y", "z"], 20),
            "tag": [f"t{i}" for i in range(60)],
        }
    )
    lds = composite_key(rd.from_pandas(left).repartition(5), ["a", "b"], "__ck")
    rds = composite_key(rd.from_pandas(right), ["ra", "rb"], "__rck")
    out = (
        bucket_join(
            lds, rds, left_on="__ck", right_on="__rck",
            left_schema=pa.schema(
                [("a", pa.int64()), ("b", pa.string()),
                 ("v", pa.int64()), ("__ck", pa.string())]
            ),
            right_schema=pa.schema(
                [("ra", pa.int64()), ("rb", pa.string()),
                 ("tag", pa.string()), ("__rck", pa.string())]
            ),
        )
        .to_pandas()[["a", "b", "v", "tag"]]
        .sort_values(["v"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, left_on=["a", "b"], right_on=["ra", "rb"])[
            ["a", "b", "v", "tag"]
        ]
        .sort_values(["v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_composite_key_null_is_not_the_string_none():
    df = pd.DataFrame(
        {
            "a": pd.array([1, 1], dtype="Int64"),
            "b": pd.array([None, "\x00null\x00".join([])], dtype="object"),
        }
    )
    df.loc[1, "b"] = "None"
    ds = composite_key(rd.from_pandas(df), ["a", "b"], "ck")
    keys = ds.to_pandas()["ck"].tolist()
    assert keys[0] != keys[1]  # (1, null) != (1, "None")


def test_composite_key_separator_cannot_alias():
    """('ab', 'c') and ('a', 'bc') must not produce the same key."""
    df = pd.DataFrame({"a": ["ab", "a"], "b": ["c", "bc"]})
    keys = composite_key(rd.from_pandas(df), ["a", "b"]).to_pandas()["__ck"]
    assert keys[0] != keys[1]
