"""ops/sample.py, ops/interval.py, ops/approx.py, functions/sketch.py."""

import numpy as np
import pandas as pd

import ray.data as rd

from session_graph_ray.functions.sketch import (
    empty_registers,
    estimate,
    hll_int_column,
    merge_registers,
    splitmix64,
)
from session_graph_ray.ops.approx import approx_count_distinct
from session_graph_ray.ops.interval import range_join_broadcast
from session_graph_ray.ops.sample import hash_sample, stratified_sample


def test_hll_accuracy_and_merge():
    r = np.random.default_rng(3)
    a = r.integers(0, 2**62, 120_000, dtype=np.uint64)
    b = r.integers(0, 2**62, 80_000, dtype=np.uint64)
    ra, rb = hll_int_column(a), hll_int_column(b)
    for vals, regs in [(a, ra), (b, rb)]:
        exact = len(np.unique(vals))
        assert abs(estimate(regs) - exact) / exact < 0.05
    # merge == sketch of the union (register-wise max is lossless)
    ru = hll_int_column(np.concatenate([a, b]))
    assert (merge_registers(ra, rb) == ru).all()
    # small range: linear counting is near-exact
    small = hll_int_column(np.arange(300, dtype=np.uint64) * 7919)
    assert abs(estimate(small) - 300) < 15


def test_splitmix64_determinism_and_spread():
    x = np.arange(10_000, dtype=np.uint64)
    h1, h2 = splitmix64(x), splitmix64(x)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == len(x)
    assert abs((h1 > 2**63).mean() - 0.5) < 0.03  # top bit balanced


def test_approx_count_distinct_groups():
    r = np.random.default_rng(5)
    frames = []
    truth = {"a": 5000, "b": 500, "c": 37}
    for g, n in truth.items():
        vals = r.choice(np.arange(n), size=n * 4)  # repeats, n distinct
        frames.append(pd.DataFrame({"g": g, "v": vals + hash(g) % 97 * 10**7}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=0)
    out = (
        approx_count_distinct(rd.from_pandas(df).repartition(6), "g", "v")
        .to_pandas()
        .set_index("g")["approx_n"]
    )
    exact = df.groupby("g")["v"].nunique()
    for g in truth:
        assert abs(out[g] - exact[g]) / exact[g] < 0.06, (g, out[g], exact[g])


def test_hash_sample_rate_and_determinism():
    df = pd.DataFrame({"id": np.arange(50_000, dtype=np.int64), "x": 1})
    s1 = hash_sample(rd.from_pandas(df).repartition(4), "id", 0.1).to_pandas()
    s2 = hash_sample(rd.from_pandas(df).repartition(9), "id", 0.1).to_pandas()
    assert sorted(s1["id"]) == sorted(s2["id"])  # sharding-independent
    assert abs(len(s1) / len(df) - 0.1) < 0.01
    s3 = hash_sample(rd.from_pandas(df), "id", 0.1, seed=99).to_pandas()
    assert sorted(s3["id"]) != sorted(s1["id"])  # independent draw per seed
    # membership is key-pure: sample of a subset == subset of the sample
    sub = df[df["id"] < 10_000]
    s4 = hash_sample(rd.from_pandas(sub), "id", 0.1).to_pandas()
    assert set(s4["id"]) == {i for i in s1["id"] if i < 10_000}


def test_stratified_sample_exact_k():
    r = np.random.default_rng(8)
    df = pd.DataFrame(
        {
            "lang": r.choice(["en", "fr", "de"], 3000),
            "doc_id": np.arange(3000, dtype=np.int64),
        }
    )
    df = pd.concat(
        [df, pd.DataFrame({"lang": ["tiny"] * 3, "doc_id": [90001, 90002, 90003]})],
        ignore_index=True,
    )
    out = stratified_sample(
        rd.from_pandas(df).repartition(5), "lang", "doc_id", 20
    ).to_pandas()
    sizes = out.groupby("lang").size()
    assert sizes[["en", "fr", "de"]].eq(20).all()
    assert sizes["tiny"] == 3
    # picks are exactly the k smallest hashes per stratum
    for lang, grp in df.groupby("lang"):
        h = splitmix64(grp["doc_id"].to_numpy().astype(np.uint64) ^ np.uint64(0xA5A5))
        expect = set(grp["doc_id"].to_numpy()[np.argsort(h)[:20]])
        assert set(out[out["lang"] == lang]["doc_id"]) == expect


def test_range_join_broadcast_matches_pandas():
    r = np.random.default_rng(13)
    ev = pd.DataFrame(
        {
            "eid": np.arange(2000),
            "ts": pd.to_datetime(r.integers(0, 10**6, 2000), unit="s").astype(
                "datetime64[us]"
            ),
        }
    )
    starts = pd.to_datetime(r.integers(0, 10**6, 15), unit="s").astype("datetime64[us]")
    iv = pd.DataFrame(
        {"win_id": np.arange(15), "start": starts,
         "end": starts + pd.Timedelta(hours=30)}  # overlapping windows
    )
    out = (
        range_join_broadcast(rd.from_pandas(ev).repartition(4), "ts", iv)
        .to_pandas()
        .sort_values(["eid", "win_id"])
        .reset_index(drop=True)
    )
    exp = (
        ev.merge(iv, how="cross")
        .query("start <= ts < end")[["eid", "ts", "win_id"]]
        .sort_values(["eid", "win_id"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    assert (out["eid"].values == exp["eid"].values).all()
    assert (out["win_id"].values == exp["win_id"].values).all()


def test_heavy_hitters_exact_regime():
    """capacity > distinct keys -> exact counts, err_ub all zero."""
    from session_graph_ray.ops.approx import approx_heavy_hitters

    rng = np.random.RandomState(7)
    keys = rng.randint(0, 50, size=20_000)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    out = approx_heavy_hitters(ds, "k", k=5, capacity=1024).to_pandas()
    exact = (
        pd.Series(keys).value_counts().rename_axis("k").reset_index(name="n")
        .sort_values(["n", "k"], ascending=[False, True]).head(5)
        .reset_index(drop=True)
    )
    assert (out["err_ub"] == 0).all()
    assert list(out["k"]) == list(exact["k"])
    assert list(out["n"]) == list(exact["n"])


def test_heavy_hitters_sketch_regime_bounds():
    """capacity << distinct keys -> compression fires; the planted heavy key
    is still recovered and every reported count is a valid lower bound with
    true_count <= n + err_ub."""
    from session_graph_ray.ops.approx import approx_heavy_hitters

    rng = np.random.RandomState(11)
    tail = rng.randint(1000, 9000, size=30_000)  # ~8k distinct tail keys
    heavy = np.full(6_000, 7, dtype=np.int64)    # one massive hitter
    keys = np.concatenate([tail, heavy])
    rng.shuffle(keys)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(16)
    out = approx_heavy_hitters(ds, "k", k=3, capacity=128, n_buckets=4).to_pandas()
    true = pd.Series(keys).value_counts()
    assert out.iloc[0]["k"] == 7
    for _, r in out.iterrows():
        t = int(true[r["k"]])
        assert r["n"] <= t <= r["n"] + r["err_ub"]


def test_approx_quantiles_grouped_accuracy():
    """Grouped approx quantiles: exact when uncompressed, rank error < 1/m
    of the group mass when compression fires."""
    from session_graph_ray.ops.approx import approx_quantiles

    rng = np.random.RandomState(3)
    n = 40_000
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 3, n),
            "v": rng.lognormal(0.0, 2.0, n),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    out = approx_quantiles(ds, "v", [0.5, 0.9], key="g", m=512).to_pandas()
    assert len(out) == 3
    for _, r in out.iterrows():
        vals = np.sort(df.loc[df["g"] == r["g"], "v"].to_numpy())
        for q, col in ((0.5, "q_50"), (0.9, "q_90")):
            rank = np.searchsorted(vals, r[col], side="right")
            assert abs(rank - q * len(vals)) <= max(2, 2 * len(vals) / 512)


def test_approx_quantiles_global_exact_small():
    from session_graph_ray.ops.approx import approx_quantiles

    v = np.arange(1.0, 101.0)
    ds = rd.from_pandas(pd.DataFrame({"v": v}))
    out = approx_quantiles(ds, "v", [0.5, 0.99], m=1024).to_pandas()
    assert float(out["q_50"].iloc[0]) == 50.0
    assert float(out["q_99"].iloc[0]) == 99.0


def test_hash_split_deterministic_and_exact():
    from session_graph_ray.ops.sample import _KNUTH, hash_split

    ids = np.arange(10_000, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(6)
    splits = {"train": 90, "val": 5, "test": 5}
    out = hash_split(ds, "doc_id", splits, seed=7).to_pandas()
    out2 = hash_split(ds.repartition(3), "doc_id", splits, seed=7).to_pandas()

    # partitioning-independent and run-deterministic
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # exact mirror of the SQL-expressible bucket formula (pure python)
    buckets = ((ids.astype(object) * _KNUTH + 7) % 2**32) % 100
    want = np.where(buckets < 90, "train", np.where(buckets < 95, "val", "test"))
    assert (a["split"].to_numpy() == want).all()

    # proportions land near the weights
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01


def test_hash_split_wraps_large_keys_exactly():
    from session_graph_ray.ops.sample import split_buckets

    ids = np.array([2**62 + 12345, 2**63 - 1, 0, 17], dtype=np.uint64)
    got = split_buckets(ids.astype(np.int64), 100, seed=7)
    want = [((int(k) * 2654435761 + 7) % 2**32) % 100 for k in ids]
    assert got.tolist() == want

    # negative keys are rejected loudly: SQL % has different semantics there
    import pytest

    with pytest.raises(ValueError):
        split_buckets(np.array([-5], dtype=np.int64), 100, seed=7)
