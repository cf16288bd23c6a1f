"""bucket_join full-outer path + ops/pivot.unpivot reshape."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.join import bucket_join
from session_graph_ray.ops.pivot import unpivot


def test_bucket_join_full_outer_preserves_both_sides(ray_session):
    l = rd.from_arrow(pa.table({
        "lk": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array([10, 20, 30], pa.int64()),
    }))
    r = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3, 4], pa.int64()),
        "rv": pa.array([200, 300, 400], pa.int64()),
    }))
    out = bucket_join(
        l, r, left_on="lk", right_on="rk", how="outer",
        left_schema=pa.schema([("lk", pa.int64()), ("lv", pa.int64())]),
        right_schema=pa.schema([("rk", pa.int64()), ("rv", pa.int64())]),
    ).to_pandas()
    assert len(out) == 4
    key = out["lk"].combine_first(out["rk"]).astype(int)
    got = {int(k): (None if pd.isna(lv) else int(lv),
                    None if pd.isna(rv) else int(rv))
           for k, lv, rv in zip(key, out["lv"], out["rv"])}
    assert got == {1: (10, None), 2: (20, 200), 3: (30, 300),
                   4: (None, 400)}
    # full-outer key contract: lk is the coalesced join key (never null),
    # rk is null-faithful (null exactly on right-unmatched rows)
    assert not out["lk"].isna().any()
    assert out.loc[key == 1, "rk"].isna().all()
    assert not out.loc[key != 1, "rk"].isna().any()


def test_unpivot_roundtrips_wide_table(ray_session):
    wide = pa.table({
        "day": pa.array([1, 2], pa.int64()),
        "a_c": pa.array([10, 0], pa.int64()),
        "b_c": pa.array([30, 40], pa.int64()),
    })
    out = unpivot(
        rd.from_arrow(wide), id_cols=["day"], value_cols=["a_c", "b_c"],
        var_name="cat", value_name="v", labels=["a", "b"],
    ).to_pandas().sort_values(["day", "cat"]).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"day": 1, "cat": "a", "v": 10}, {"day": 1, "cat": "b", "v": 30},
        {"day": 2, "cat": "a", "v": 0}, {"day": 2, "cat": "b", "v": 40},
    ]
