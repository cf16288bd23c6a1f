"""Edge cases for ops/rank.py beyond the random cross-checks."""

import numpy as np
import pandas as pd

import ray.data as rd

from session_graph_ray.ops.rank import grouped_quantile_disc, partitioned_ntile


def test_quantile_single_value_and_extremes():
    df = pd.DataFrame({"g": ["a"] * 50 + ["b"], "v": [7] * 50 + [3]})
    out = (
        grouped_quantile_disc(
            rd.from_pandas(df), "g", "v", {"p01": 0.01, "p50": 0.5, "p100": 1.0}
        )
        .to_pandas()
        .set_index("g")
    )
    assert (out.loc["a"] == 7).all()
    assert (out.loc["b"] == 3).all()


def test_quantile_rank_semantics_boundary():
    # 4 values: ceil(.5*4)=2 -> 2nd smallest; ceil(.75*4)=3 -> 3rd
    df = pd.DataFrame({"g": "x", "v": [10, 20, 30, 40]})
    out = grouped_quantile_disc(
        rd.from_pandas(df), "g", "v", {"p50": 0.5, "p75": 0.75}
    ).to_pandas()
    assert out["p50"][0] == 20 and out["p75"][0] == 30


def test_ntile_single_row_partitions():
    df = pd.DataFrame({"p": list("abc"), "v": [5, 5, 5], "id": [1, 2, 3]})
    out = partitioned_ntile(rd.from_pandas(df), "p", "v", "id", 4).to_pandas()
    assert (out["tile"] == 1).all()


def test_ntile_two_tiles_exact_split():
    # n=6, k=2 -> ranks 1-3 tile 1, ranks 4-6 tile 2 (order v then id)
    df = pd.DataFrame(
        {"p": "x", "v": [1, 1, 2, 2, 3, 3], "id": [6, 5, 4, 3, 2, 1]}
    )
    out = (
        partitioned_ntile(rd.from_pandas(df), "p", "v", "id", 2)
        .to_pandas()
        .sort_values(["v", "id"])
    )
    assert out["tile"].tolist() == [1, 1, 1, 2, 2, 2]


def test_ntile_rejects_out_of_range():
    df = pd.DataFrame({"p": "x", "v": [-1, 2], "id": [0, 1]})
    try:
        partitioned_ntile(rd.from_pandas(df), "p", "v", "id", 2)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_ntile_large_order_range():
    # order values spanning well past the 4096-bin width; uniqueness only
    # via tiebreak inside heavy duplicate runs
    r = np.random.default_rng(99)
    n = 5000
    df = pd.DataFrame(
        {
            "p": "only",
            "v": np.concatenate(
                [r.integers(0, 2**30, n // 2), np.full(n // 2, 12345)]
            ),
            "id": np.arange(n),
        }
    )
    out = partitioned_ntile(rd.from_pandas(df).repartition(6), "p", "v", "id", 7)
    res = out.to_pandas().sort_values(["v", "id"]).reset_index(drop=True)
    sizes = res.groupby("tile").size()
    # ntile sizes: first n%k tiles one larger
    assert sorted(sizes.tolist(), reverse=True) == sizes.tolist()
    assert sizes.max() - sizes.min() <= 1
    # tiles are contiguous in the (v, id) order
    assert (res["tile"].diff().fillna(0) >= 0).all()
