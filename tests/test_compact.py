"""ops/compact.latest_per_key: CDC compaction semantics."""

import numpy as np
import pyarrow as pa

import ray.data

from session_graph_ray.ops.compact import latest_per_key

_SCHEMA = pa.schema([
    ("k", pa.int64()), ("ver", pa.int64()), ("rid", pa.int64()),
    ("payload", pa.string()),
])


def _run(rows, parts=1):
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "ver": pa.array([r[1] for r in rows], pa.int64()),
        "rid": pa.array([r[2] for r in rows], pa.int64()),
        "payload": pa.array([r[3] for r in rows], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = latest_per_key(ds, "k", "ver", "rid", _SCHEMA).to_pandas()
    return {int(r.k): (int(r.ver), int(r.rid), r.payload)
            for r in out.itertuples()}


def test_latest_per_key_keeps_max_and_breaks_ties_by_rid(ray_session):
    rows = [
        (1, 10, 100, "old"), (1, 20, 101, "new"),
        (2, 5, 102, "a"), (2, 5, 103, "b"),  # tie on ver -> max rid wins
        (3, 7, 104, "only"),
    ]
    got = _run(rows)
    assert got == {1: (20, 101, "new"), 2: (5, 103, "b"),
                   3: (7, 104, "only")}


def test_latest_per_key_partition_independent(ray_session):
    rng = np.random.RandomState(11)
    rows = [
        (int(rng.randint(0, 30)), int(rng.randint(0, 1000)), rid,
         f"p{rid}")
        for rid in range(500)
    ]
    assert _run(rows, parts=1) == _run(rows, parts=23)
