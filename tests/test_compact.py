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


def test_apply_cdc_upsert_delete_reinsert():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from session_graph_ray.ops.compact import apply_cdc, latest_per_key

    schema = pa.schema([("k", pa.int64()), ("o", pa.int64()),
                        ("tb", pa.int64()), ("v", pa.int64()),
                        ("op", pa.string())])

    def tbl(rows):
        return rd.from_arrow(pa.table({
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "o": pa.array([r[1] for r in rows], pa.int64()),
            "tb": pa.array([r[2] for r in rows], pa.int64()),
            "v": pa.array([r[3] for r in rows], pa.int64()),
            "op": pa.array([r[4] for r in rows], pa.string()),
        })).repartition(3)

    base = tbl([(1, 0, 0, 10, "U"), (2, 0, 0, 20, "U"),
                (3, 0, 0, 30, "U"), (4, 0, 0, 40, "U")])
    changes = tbl([
        (1, 5, 1, 11, "U"),               # upsert wins over base
        (2, 5, 2, 0, "D"),                # delete drops key 2
        (3, 5, 3, 0, "D"), (3, 6, 4, 33, "U"),  # re-insert after delete
        (5, 5, 5, 50, "U"),               # brand-new key
    ])
    snap = (apply_cdc(base, changes, "k", "o", "tb", "op", schema)
            .to_pandas().sort_values("k").reset_index(drop=True))
    got = {int(r.k): int(r.v) for r in snap.itertuples(index=False)}
    assert got == {1: 11, 3: 33, 4: 40, 5: 50}
    # idempotent: re-applying the same changelog to the compacted snapshot
    again = (apply_cdc(
        latest_per_key(apply_cdc(base, changes, "k", "o", "tb", "op",
                                 schema), "k", "o", "tb", schema),
        changes, "k", "o", "tb", "op", schema)
        .to_pandas().sort_values("k").reset_index(drop=True))
    got2 = {int(r.k): int(r.v) for r in again.itertuples(index=False)}
    assert got2 == got
