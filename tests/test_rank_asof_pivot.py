"""ops/asof.py, ops/rank.py, ops/pivot.py vs vectorized pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.asof import asof_join_backward
from session_graph_ray.ops.pivot import pivot_sum
from session_graph_ray.ops.rank import grouped_quantile_disc, partitioned_ntile


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_asof_join_backward_matches_pandas():
    r = _rng()
    n_l, n_r = 400, 150
    left = pd.DataFrame(
        {
            "eid": np.arange(n_l),
            "k": r.integers(0, 12, n_l),
            "ts": pd.to_datetime(r.integers(0, 10**6, n_l), unit="s").astype(
                "datetime64[us]"
            ),
        }
    )
    right = pd.DataFrame(
        {
            "rk": r.integers(0, 15, n_r),  # keys 12-14 never match; key 11 absent
            "rts": pd.to_datetime(r.integers(0, 10**6, n_r), unit="s").astype(
                "datetime64[us]"
            ),
        }
    )
    right = right[right["rk"] != 11]
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("rts"),
        left_on="ts", right_on="rts", left_by="k", right_by="rk",
    ).rename(columns={"rts": "last_ts"})[["eid", "k", "ts", "last_ts"]]

    out = asof_join_backward(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        left_key="k", right_key="rk", left_ts="ts", right_ts="rts",
        right_out={"rts": "last_ts"},
        left_schema=pa.schema(
            [("eid", pa.int64()), ("k", pa.int64()), ("ts", pa.timestamp("us"))]
        ),
        right_schema=pa.schema(
            [("rk", pa.int64()), ("rts", pa.timestamp("us"))]
        ),
    ).to_pandas()
    assert len(out) == n_l
    merged = out.sort_values("eid").reset_index(drop=True)
    exp = exp.sort_values("eid").reset_index(drop=True)
    assert merged["last_ts"].isna().equals(exp["last_ts"].isna())
    m = ~exp["last_ts"].isna()
    assert (merged.loc[m, "last_ts"].values == exp.loc[m, "last_ts"].values).all()


def test_grouped_quantile_disc_exact():
    r = _rng(11)
    df = pd.DataFrame(
        {"g": r.choice(["a", "b", "c"], 5000), "v": r.integers(0, 300, 5000)}
    )
    out = (
        grouped_quantile_disc(
            rd.from_pandas(df).repartition(6), "g", "v",
            {"p50": 0.5, "p90": 0.9, "p99": 0.99},
        )
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for g, grp in df.groupby("g"):
        s = np.sort(grp["v"].to_numpy())
        for name, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
            assert out.loc[g, name] == s[int(np.ceil(q * len(s))) - 1], (g, name)


def _ntile_ref(df, part, order, tiebreak, k):
    def f(g):
        g = g.sort_values([order, tiebreak], kind="stable").reset_index(drop=True)
        n = len(g)
        r = np.arange(1, n + 1)
        size_small, big = divmod(n, k)
        cut = big * (size_small + 1)
        if size_small == 0:
            g["tile"] = r
        else:
            g["tile"] = np.where(
                r <= cut,
                (r - 1) // (size_small + 1) + 1,
                big + (r - 1 - cut) // size_small + 1,
            )
        return g

    return pd.concat([f(g) for _, g in df.groupby(part)], ignore_index=True)


def test_partitioned_ntile_random():
    r = _rng(23)
    n = 3000
    df = pd.DataFrame(
        {
            "p": r.choice(["en", "fr", "zz"], n, p=[0.6, 0.39, 0.01]),
            "v": r.integers(0, 80, n),  # heavy ties within each order value
            "id": r.permutation(n),
        }
    )
    # plant a tiny partition (rows < tiles) and an all-equal-order partition
    df.loc[df["p"] == "zz", "v"] = 42
    tiny = pd.DataFrame({"p": ["t1"] * 3, "v": [9, 1, 5], "id": [90001, 90002, 90003]})
    df = pd.concat([df, tiny], ignore_index=True)

    out = (
        partitioned_ntile(
            rd.from_pandas(df).repartition(7), "p", "v", "id", 10, out_col="tile"
        )
        .to_pandas()
        .sort_values(["p", "id"])
        .reset_index(drop=True)
    )
    exp = (
        _ntile_ref(df, "p", "v", "id", 10)
        .sort_values(["p", "id"])
        .reset_index(drop=True)
    )
    assert (out["tile"].values == exp["tile"].values).all()


def test_pivot_sum_matches_pandas():
    r = _rng(31)
    n = 4000
    cats = ["click", "view", "buy"]
    df = pd.DataFrame(
        {
            "day": r.integers(0, 20, n),
            "cat": r.choice(cats + ["other"], n),
            "v": r.integers(0, 1000, n),
        }
    )
    out = (
        pivot_sum(rd.from_pandas(df).repartition(5), "day", "cat", "v", cats)
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    exp_n = df.groupby("day").size()
    for c in cats:
        exp = df[df["cat"] == c].groupby("day")["v"].sum().reindex(
            exp_n.index, fill_value=0
        )
        assert (out.set_index("day")[f"{c}_c"] == exp).all(), c
    assert (out.set_index("day")["n"] == exp_n).all()
    assert "other_c" not in out.columns


def test_grouped_mad_outliers_planted():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from session_graph_ray.ops.rank import grouped_mad_outliers

    rng = np.random.default_rng(2)
    base = rng.integers(90, 111, size=500)        # tight cluster
    planted = np.array([10_000, -10_000, 9_999])  # obvious outliers
    vals = np.concatenate([base, planted])
    t = pa.table({"k": pa.array(["a"] * len(vals)),
                  "v": pa.array(vals.astype(np.int64))})
    out = grouped_mad_outliers(rd.from_arrow(t).repartition(4),
                               "k", "v").to_pandas()
    row = out.iloc[0]
    assert 90 <= row["median"] <= 110
    assert row["mad"] <= 10
    assert row["n_rows"] == len(vals)
    assert row["n_outliers"] == 3   # exactly the planted rows
    # partition independence
    out2 = grouped_mad_outliers(rd.from_arrow(t).repartition(1),
                                "k", "v").to_pandas()
    assert out.equals(out2)
