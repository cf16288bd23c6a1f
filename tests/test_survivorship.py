"""Golden-record survivorship operator (ops/survivorship.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from session_graph_ray.ops.survivorship import golden_records

ROWS = [
    # key, val_s, val_n
    ("a", "y", 5),
    ("a", "x", 3),
    ("a", "y", 9),
    ("b", "q", 1),
    ("b", "p", 1),   # mode tie in b: p vs q both 1 -> smallest wins = "p"
    ("c", "zz", 7),
]


def _ds(block_size: int) -> "rd.Dataset":
    t = pa.table({
        "k": pa.array([r[0] for r in ROWS]),
        "s": pa.array([r[1] for r in ROWS]),
        "n": pa.array([r[2] for r in ROWS], pa.int64()),
    })
    return rd.from_arrow(t).repartition(block_size)


RULES = {
    "n_members": "count:",
    "mode_s": "mode:s",
    "min_s": "min:s",
    "max_s": "max:s",
    "min_n": "min:n",
    "max_n": "max:n",
}

EXPECT = {
    "a": dict(n_members=3, mode_s="y", min_s="x", max_s="y", min_n=3, max_n=9),
    "b": dict(n_members=2, mode_s="p", min_s="p", max_s="q", min_n=1, max_n=1),
    "c": dict(n_members=1, mode_s="zz", min_s="zz", max_s="zz",
              min_n=7, max_n=7),
}


@pytest.mark.parametrize("nblocks", [1, 3, 6])
def test_golden_records_rules_and_layout_invariance(nblocks):
    out = golden_records(_ds(nblocks), "k", RULES).to_pandas()
    out = out.set_index("k").sort_index()
    assert list(out.index) == ["a", "b", "c"]
    for k, exp in EXPECT.items():
        for col, v in exp.items():
            assert out.loc[k, col] == v, (k, col, out.loc[k, col], v)


def test_golden_records_integer_key_and_mode_tiebreak():
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "s": pa.array(["b", "a", "b", "a", "c"]),
    })
    out = golden_records(rd.from_arrow(t), "k",
                         {"m": "mode:s", "n_members": "count:"}).to_pandas()
    out = out.set_index("k").sort_index()
    # 2x "a" vs 2x "b": tie -> smallest value "a"
    assert out.loc[1, "m"] == "a" and out.loc[1, "n_members"] == 4
    assert out.loc[2, "m"] == "c"


def test_golden_records_timestamps():
    ts = np.array(["2020-01-02", "2020-01-01", "2020-03-01"],
                  dtype="datetime64[us]")
    t = pa.table({"k": pa.array(["u", "u", "u"]), "ts": pa.array(ts)})
    out = golden_records(rd.from_arrow(t), "k",
                         {"lo": "min:ts", "hi": "max:ts"}).to_pandas()
    assert out.loc[0, "lo"] == np.datetime64("2020-01-01", "us")
    assert out.loc[0, "hi"] == np.datetime64("2020-03-01", "us")


def test_golden_records_rejects_unknown_rule():
    with pytest.raises(ValueError):
        golden_records(_ds(1), "k", {"x": "median:n"})
