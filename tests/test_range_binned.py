"""ops/interval.range_join_binned vs the broadcast reference."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.interval import (
    range_join_binned,
    range_join_broadcast,
)

_PTS = pa.schema([("pid", pa.int64()), ("ts", pa.int64())])


def _binned(pts, ivs, bin_us, parts=1):
    p = rd.from_arrow(pa.table({
        "pid": pa.array([x[0] for x in pts], pa.int64()),
        "ts": pa.array([x[1] for x in pts], pa.int64()),
    }))
    i = rd.from_arrow(pa.table({
        "win_id": pa.array([x[0] for x in ivs], pa.int64()),
        "start": pa.array([x[1] for x in ivs], pa.int64()),
        "end": pa.array([x[2] for x in ivs], pa.int64()),
    }))
    if parts > 1:
        p, i = p.repartition(parts), i.repartition(parts)
    out = range_join_binned(p, i, ts_col="ts", point_schema=_PTS,
                            bin_us=bin_us).to_pandas()
    return sorted(zip(out["pid"], out["win_id"]))


def _brute(pts, ivs):
    return sorted((pid, wid) for pid, ts in pts
                  for wid, s, e in ivs if s <= ts < e)


def test_range_join_binned_edges(ray_session):
    # end-exclusive boundary, interval inside one cell, spanning 3 cells,
    # empty interval dropped, overlapping intervals multiply
    pts = [(1, 0), (2, 99), (3, 100), (4, 250), (5, 305)]
    ivs = [(10, 0, 100),     # catches ts 0, 99; NOT 100 (end-exclusive)
           (11, 90, 310),    # spans cells 0..3 at W=100
           (12, 250, 250),   # empty: dropped
           (13, 240, 260)]   # overlaps 11 on ts=250
    got = _binned(pts, ivs, bin_us=100)
    assert got == _brute(pts, ivs)
    assert (4, 11) in got and (4, 13) in got and (3, 10) not in got


def test_range_join_binned_matches_broadcast_randomized(ray_session):
    rng = np.random.RandomState(17)
    pts = [(i, int(rng.randint(0, 5000))) for i in range(300)]
    ivs = []
    for w in range(60):
        s = int(rng.randint(0, 5000))
        ivs.append((w, s, s + int(rng.randint(1, 800))))
    for W in (50, 333, 10_000):  # cells smaller, odd, larger than spans
        assert _binned(pts, ivs, bin_us=W, parts=7) == _brute(pts, ivs)

    # broadcast path agrees too (timestamps as us-epoch datetimes)
    p = rd.from_arrow(pa.table({
        "pid": pa.array([x[0] for x in pts], pa.int64()),
        "ts": pa.array([x[1] for x in pts], pa.int64()).cast(
            pa.timestamp("us")),
    }))
    iv = pd.DataFrame({
        "win_id": [x[0] for x in ivs],
        "start": pd.to_datetime([x[1] for x in ivs], unit="us"),
        "end": pd.to_datetime([x[2] for x in ivs], unit="us"),
    })
    out = range_join_broadcast(p, "ts", iv).to_pandas()
    assert sorted(zip(out["pid"], out["win_id"])) == _brute(pts, ivs)


def test_interval_overlap_binned_vs_brute():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from session_graph_ray.ops.interval import interval_overlap_binned

    rng = np.random.default_rng(13)
    W = 100  # cell width; spans up to 5 cells

    def mk(n, id0):
        s = rng.integers(0, 2000, n)
        ln = rng.integers(0, 500, n)  # includes empty intervals (ln=0)
        return (np.arange(id0, id0 + n, dtype=np.int64), s, s + ln)

    aid, as_, ae = mk(80, 0)
    bid, bs, be = mk(120, 1000)
    a = rd.from_arrow(pa.table({"a_id": pa.array(aid),
                                "start": pa.array(as_.astype(np.int64)),
                                "end": pa.array(ae.astype(np.int64))}))
    b = rd.from_arrow(pa.table({"b_id": pa.array(bid),
                                "start": pa.array(bs.astype(np.int64)),
                                "end": pa.array(be.astype(np.int64))}))
    got = interval_overlap_binned(a.repartition(4), b.repartition(5),
                                  bin_us=W).to_pandas()
    # exactly-once: no duplicate pairs even for multi-cell intersections
    assert not got.duplicated(["a_id", "b_id"]).any()
    gset = set(zip(got.a_id, got.b_id))
    want = {(int(i), int(j))
            for i, s1, e1 in zip(aid, as_, ae) if s1 < e1
            for j, s2, e2 in zip(bid, bs, be) if s2 < e2
            if max(s1, s2) < min(e1, e2)}
    assert gset == want and len(want) > 100
