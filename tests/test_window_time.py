"""ops/window.sliding_time_sum + ops/rank.grouped_mode semantics."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.rank import grouped_mode
from session_graph_ray.ops.window import sliding_time_sum

_SCHEMA = pa.schema([
    ("k", pa.int64()), ("ts", pa.int64()), ("v", pa.int64()),
])


def _roll(rows, window, parts=1):
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64()),
    })
    ds = rd.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = sliding_time_sum(ds, "k", "ts", "v", window, _SCHEMA,
                           out_col="roll").to_pandas()
    return {(int(r.k), int(r.ts), int(r.v)): int(r.roll)
            for r in out.itertuples()}


def _brute(rows, window):
    return {
        (k, ts, v): sum(v2 for k2, t2, v2 in rows
                        if k2 == k and ts - window <= t2 <= ts)
        for k, ts, v in rows
    }


def test_sliding_time_sum_range_frame_with_peers(ray_session):
    # key 1: ties at ts=10 (peers must see each other, RANGE semantics);
    # key 2: a gap larger than the window resets the sum
    rows = [
        (1, 0, 5), (1, 10, 7), (1, 10, 11), (1, 25, 1),
        (2, 0, 3), (2, 100, 4),
    ]
    got = _roll(rows, window=15)
    assert got[(1, 10, 7)] == 5 + 7 + 11
    assert got[(1, 10, 11)] == 5 + 7 + 11
    assert got[(1, 25, 1)] == 7 + 11 + 1   # ts=0 is out of [10, 25]
    assert got[(2, 100, 4)] == 4
    assert got == _brute(rows, 15)


def test_sliding_time_sum_randomized_vs_brute(ray_session):
    rng = np.random.RandomState(7)
    rows = list({
        (int(rng.randint(0, 8)), int(rng.randint(0, 500)),
         int(rng.randint(-50, 50)))
        for _ in range(400)
    })
    for w in (1, 37, 499):
        assert _roll(rows, w, parts=13) == _brute(rows, w)


def test_sliding_time_sum_overflow_fallback_matches(ray_session):
    """Per-run spans totalling > 2^62 trip the rebase-overflow gate; the
    per-run searchsorted fallback must produce identical sums."""
    big = 2 ** 61  # three runs spanning 2^61 each -> sum of spans > 2^62
    rows = []
    for k in range(3):
        rows += [(k, 0, 1), (k, big, 2), (k, big + 5, 3)]
    got = _roll(rows, window=10)
    assert got == _brute(rows, 10)
    assert got[(0, big + 5, 3)] == 5 and got[(0, 0, 1)] == 1


def test_grouped_mode_tiebreak_and_partition_independence(ray_session):
    rows = [
        (1, "b"), (1, "b"), (1, "a"), (1, "a"),  # tie -> 'a' (smaller)
        (2, "z"), (2, "z"), (2, "y"),
        (3, "m"),
    ]

    def run(parts):
        t = pa.table({
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.string()),
        })
        ds = rd.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        out = grouped_mode(ds, "k", "v").to_pandas()
        return {int(r.k): (r.mode, int(r.cnt)) for r in out.itertuples()}

    want = {1: ("a", 2), 2: ("z", 2), 3: ("m", 1)}
    assert run(1) == want
    assert run(5) == want


def test_scd2_history_semantics_and_partition_independence():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from session_graph_ray.ops.window import scd2_history

    # user 1: A A B B A (changes at rows 0, 2, 4); user 2: single row;
    # user 3: tie on the order column resolved by tiebreak
    rows = [
        (1, 10, 100, 7), (1, 20, 101, 7), (1, 30, 102, 8),
        (1, 40, 103, 8), (1, 50, 104, 7),
        (2, 10, 200, 9),
        (3, 10, 300, 5), (3, 10, 301, 6),
    ]
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "tb": pa.array([r[2] for r in rows], pa.int64()),
        "v": pa.array([r[3] for r in rows], pa.int64()),
    })
    schema = t.schema

    def run(parts):
        return (scd2_history(rd.from_arrow(t).repartition(parts),
                             key_col="k", order_col="o", tiebreak_col="tb",
                             value_col="v", schema=schema)
                .to_pandas()
                .sort_values(["k", "valid_from", "change_id"])
                .reset_index(drop=True))

    got = run(1)
    recs = [tuple(None if x is None or (isinstance(x, float) and np.isnan(x))
                  else int(x) for x in r)
            for r in got.itertuples(index=False)]
    assert recs == [
        (1, 7, 100, 10, 30), (1, 8, 102, 30, 50), (1, 7, 104, 50, None),
        (2, 9, 200, 10, None),
        (3, 5, 300, 10, 10), (3, 6, 301, 10, None),
    ]
    assert got.equals(run(5))
