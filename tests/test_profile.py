"""One-pass table profiler (ops/profile.py): exact counts/min/max, null
accounting, string columns, timestamps, and HLL distinct accuracy."""

import numpy as np
import pandas as pd
import ray.data as rd

from session_graph_ray.ops.profile import profile_table


def test_profile_mixed_types_with_nulls():
    rng = np.random.RandomState(7)
    n = 20_000
    df = pd.DataFrame(
        {
            "x": rng.randint(0, 500, n).astype(np.int64),
            "y": rng.lognormal(0, 1, n),
            "s": [f"name_{i % 321}" for i in range(n)],
            "t": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        }
    )
    df.loc[df.index[:500], "y"] = np.nan
    df["y2"] = df["y"]
    # arrow-level nulls (pandas NaN on float becomes arrow null via from_pandas)
    ds = rd.from_pandas(df).repartition(7)
    prof = (
        profile_table(ds, ["x", "y", "s", "t"])
        .to_pandas()
        .set_index("col")
    )
    assert (prof["n"] == n).all()
    assert prof.loc["x", "n_null"] == 0
    assert prof.loc["y", "n_null"] == 500
    assert prof.loc["x", "min_num"] == df["x"].min()
    assert prof.loc["x", "max_num"] == df["x"].max()
    assert prof.loc["y", "min_num"] == df["y"].min()  # NaN-excluded min
    assert prof.loc["s", "min_str"] == "name_0"
    assert prof.loc["s", "max_str"] == "name_99"
    # timestamp min/max as epoch ints in the column's own unit (ns here)
    assert prof.loc["t", "min_num"] == df["t"].min().value
    assert prof.loc["t", "max_num"] == df["t"].max().value
    # HLL accuracy: ~1.6% expected at p=12; allow 5%
    for c, true in (("x", 500), ("s", 321)):
        est = prof.loc[c, "n_distinct_approx"]
        assert abs(est - true) / true < 0.05


def test_profile_constant_size_partials():
    """The pre-shuffle exchange is num_batches x num_columns rows — profile
    of a 100k-row table moves only a few partial rows per block."""
    from session_graph_ray.ops.profile import _col_partial
    import pyarrow as pa

    col = pa.chunked_array([pa.array(np.arange(100_000))])
    row = _col_partial("c", col)
    assert len(row["hll"]) == 4096  # constant regardless of rows
    assert row["n"] == 100_000 and row["n_null"] == 0


def test_value_histogram_exact_and_clamped():
    import ray.data as rd

    from session_graph_ray.ops.profile import value_histogram

    rows = [{"k": "a", "v": x} for x in [0.0, 24.9, 25.0, 49.9, 1000.0, -5.0]]
    rows += [{"k": "b", "v": 12.0}]
    out = value_histogram(rd.from_items(rows), "v", bin_width=25.0,
                          n_bins=3, key="k").to_pandas()
    got = {(r.k, r.bin): r.n for r in out.itertuples()}
    # a: 0.0, 24.9 -> bin 0; 25.0, 49.9 -> bin 1; 1000 -> clamped bin 2;
    #    -5 -> clamped bin 0
    assert got[("a", 0)] == 3 and got[("a", 1)] == 2 and got[("a", 2)] == 1
    assert got[("b", 0)] == 1
    assert out.n.sum() == 7
