"""Source/sink connector tests: SQLite partitioned reads, robust JSONL with
quarantine, JSONL sink round-trip, ZIP conversation-tree flattening,
collect-list / string-agg."""

import json
import os
import sqlite3
import zipfile

import pyarrow as pa

import ray.data as rd


def _mk_sqlite(path, n=100):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (k INTEGER, name TEXT, v REAL)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?)",
        [(i, f"n{i % 7}", i * 0.5) for i in range(n)],
    )
    con.commit()
    con.close()


def test_sqlite_partitioned_read_complete(tmp_path):
    from session_graph_ray.sources.sqlite import read_sqlite_table

    db = str(tmp_path / "t.db")
    _mk_sqlite(db, n=100)
    out = read_sqlite_table(db, "t", n_partitions=7).to_pandas()
    assert len(out) == 100
    assert sorted(out["k"]) == list(range(100))
    assert set(out.columns) == {"k", "name", "v"}

    # column projection
    out2 = read_sqlite_table(db, "t", columns=["k"], n_partitions=3).to_pandas()
    assert list(out2.columns) == ["k"]
    assert len(out2) == 100


def test_sqlite_query_reader(tmp_path):
    from session_graph_ray.sources.sqlite import read_sqlite_query

    db = str(tmp_path / "q.db")
    _mk_sqlite(db, n=20)
    out = read_sqlite_query(db, "SELECT name, COUNT(*) AS n FROM t GROUP BY name "
                                "ORDER BY name").to_pandas()
    assert len(out) == 7
    assert out["n"].sum() == 20


def test_jsonl_robust_quarantine(tmp_path):
    from session_graph_ray.sources.jsonl import (
        clean_rows,
        quarantined_rows,
        read_jsonl_robust,
    )

    p = tmp_path / "mix.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"a": 1, "b": "x"}) + "\n")
        f.write("THIS IS NOT JSON\n")
        f.write(json.dumps({"a": 2}) + "\n")
        f.write("[1,2,3]\n")  # valid JSON, not an object -> quarantined
        f.write("\n")  # blank lines are skipped, not quarantined
        f.write(json.dumps({"a": 3, "b": "y", "extra": True}) + "\n")

    ds = read_jsonl_robust(str(p), {"a": pa.int64(), "b": pa.string()})
    clean = clean_rows(ds).to_pandas().sort_values("a")
    bad = quarantined_rows(ds).to_pandas()
    assert clean["a"].tolist() == [1, 2, 3]
    assert clean["b"].tolist()[0] == "x"
    assert len(bad) == 2
    assert bad["_error"].notna().all()
    assert "NOT JSON" in " ".join(bad["_raw"])


def test_jsonl_sink_roundtrip(tmp_path):
    from session_graph_ray.sources.jsonl import (
        clean_rows,
        read_jsonl_robust,
        write_jsonl,
    )

    ds = rd.from_items([{"k": i, "s": f"v{i}"} for i in range(50)])
    out = str(tmp_path / "sink")
    write_jsonl(ds, out)
    back = clean_rows(
        read_jsonl_robust(out, {"k": pa.int64(), "s": pa.string()})
    ).to_pandas()
    assert sorted(back["k"]) == list(range(50))


def test_zip_tree_flatten(tmp_path):
    from session_graph_ray.sources.archives import (
        flatten_conversation_tree,
        read_zip_conversations,
    )

    mapping = {
        "r": {"parent": None, "children": ["c1", "c2"],
              "message": {"role": "user", "text": "root"}},
        "c1": {"parent": "r", "children": ["g1"],
               "message": {"role": "assistant", "text": "first"}},
        "g1": {"parent": "c1", "children": [],
               "message": {"role": "user", "text": "deep"}},
        "c2": {"parent": "r", "children": [],
               "message": {"role": "assistant", "text": "second"}},
    }
    flat = flatten_conversation_tree(mapping)
    # depth-first: root -> c1 -> g1 -> c2
    assert [r["text"] for r in flat] == ["root", "first", "deep", "second"]
    assert [r["seq"] for r in flat] == [0, 1, 2, 3]

    z = tmp_path / "conv.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("conversations.json",
                    json.dumps([{"id": 7, "mapping": mapping}]))
    out = read_zip_conversations(str(z)).to_pandas().sort_values("seq")
    assert out["conv_id"].eq(7).all()
    assert out["text"].tolist() == ["root", "first", "deep", "second"]


def test_collect_list_and_string_agg():
    from session_graph_ray.ops.collect import collect_list, string_agg

    ds = rd.from_items(
        [{"k": "a", "v": 5}, {"k": "a", "v": 1}, {"k": "a", "v": 5},
         {"k": "a", "v": 3}, {"k": "b", "v": 9}]
    )
    cl = collect_list(ds, "k", "v", cap=2).to_pandas().set_index("k")
    assert list(cl.loc["a", "values"]) == [1, 3]  # distinct, sorted, capped
    assert list(cl.loc["b", "values"]) == [9]

    sa = string_agg(ds, "k", "v", cap=3).to_pandas().set_index("k")
    assert sa.loc["a", "agg"] == "1,3,5"
    assert sa.loc["b", "agg"] == "9"


def test_custom_blocking_key_registry():
    """SURVEY.md §2.12: a user-registered blocking key takes effect without
    touching the stages."""
    import numpy as np

    from session_graph_ray.config import ERConfig
    from session_graph_ray.registry import register_blocking_key
    from session_graph_ray.stages.blocking import explode_keys_batch
    from session_graph_ray.stages.normalize import normalize_core_batch

    @register_blocking_key("repo")
    def repo_keys(batch, cfg):
        from session_graph_ray.functions.hashing import hash64_np
        from session_graph_ray.ops.pairing import KEYS_SCHEMA

        repos = batch.column("repo").to_pylist()
        fid = batch.column("file_id_u64").to_numpy(zero_copy_only=False)
        sha = batch.column("sha_u64").to_numpy(zero_copy_only=False)
        keys = hash64_np(repos) | np.uint64(3 << 62)
        return pa.table(
            {
                "block_key": pa.array(keys, pa.uint64()),
                "file_id": pa.array(fid.astype(np.uint64), pa.uint64()),
                "fam": pa.array(np.full(len(repos), 3, np.int8), pa.int8()),
                "sha": pa.array(sha.astype(np.uint64), pa.uint64()),
            }
        )

    rows = pa.table(
        {
            "repo": ["r1", "r1", "r2"],
            "path": ["a/x.py", "b/y.py", "c/z.py"],
            "commit": ["1" * 40, "2" * 40, "3" * 40],
            "lang": ["python"] * 3,
            "content": ["def f(): return 1" * 3] * 3,
        }
    )
    norm = normalize_core_batch(rows)
    cfg = ERConfig(blocking_keys=("sha", "repo"))
    out = explode_keys_batch(norm, cfg)
    fams = set(out.column("fam").to_pylist())
    assert fams == {0, 3}  # sha + the custom family, no stem/minhash


def test_custom_scorer_feature_registry():
    from session_graph_ray.config import ERConfig
    from session_graph_ray.registry import (
        register_scorer_feature,
        unregister_scorer_feature,
    )
    from session_graph_ray.stages.scoring import PairScorer

    import numpy as np

    @register_scorer_feature("always_one", weight=1.0)
    def always_one(batch):
        return np.ones(batch.num_rows)

    try:
        b = pa.table(
            {
                "id_a": pa.array(["a"]), "id_b": pa.array(["b"]),
                "block_key": pa.array(["k"]),
                "sha_a": pa.array([1], pa.uint64()),
                "sha_b": pa.array([2], pa.uint64()),
                "stem_a": pa.array(["x"]), "stem_b": pa.array(["x"]),
                "tokens_a": pa.array([b""], pa.binary()),
                "tokens_b": pa.array([b""], pa.binary()),
                "trunc_a": pa.array(["foo"]), "trunc_b": pa.array(["foo"]),
            }
        )
        out = PairScorer(ERConfig())(b).to_pydict()
        # jw=1 (same stem), tj=0, lev=1 (identical trunc), extra=1:
        # (.3*1 + .35*0 + .35*1 + 1*1) / 2.0 = 0.825
        assert abs(out["score"][0] - 0.825) < 1e-9
    finally:
        unregister_scorer_feature("always_one")


def test_read_parquet_evolved(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from session_graph_ray.sources.parquet import read_parquet_evolved

    p1 = str(tmp_path / "e1.parquet")
    p2 = str(tmp_path / "e2.parquet")
    p3 = str(tmp_path / "e3.parquet")
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64()),
                             "b": pa.array(["x", "y"])}), p1)
    pq.write_table(pa.table({"a": pa.array([3], pa.int64()),
                             "b": pa.array(["z"]),
                             "c": pa.array([30], pa.int64())}), p2)
    pq.write_table(pa.table({"a": pa.array([4], pa.int64()),
                             "c": pa.array([40], pa.int64())}), p3)

    df = (read_parquet_evolved([p1, p2, p3]).to_pandas()
          .sort_values("a").reset_index(drop=True))
    assert list(df.columns) == ["a", "b", "c"]
    assert list(df.a) == [1, 2, 3, 4]
    assert list(df.b)[:3] == ["x", "y", "z"] and df.b.isna().iloc[3]
    assert df.c.isna().iloc[0] and df.c.isna().iloc[1]
    assert list(df.c)[2:] == [30, 40]

    # column selection incl. a group that has NONE of the requested cols
    dfc = (read_parquet_evolved([p1, p3], columns=["c"]).to_pandas())
    assert list(dfc.columns) == ["c"]
    assert len(dfc) == 3 and dfc.c.isna().sum() == 2

    # type drift raises instead of silently casting
    p4 = str(tmp_path / "e4.parquet")
    pq.write_table(pa.table({"a": pa.array([9.5], pa.float64())}), p4)
    with pytest.raises(TypeError, match="schema drift"):
        read_parquet_evolved([p1, p4])


def test_mongo_extended_json_timestamps(tmp_path):
    """VERDICT r3 #6: a Grok-shaped export's Mongo extended-JSON
    create_time ({\"$date\": {\"$numberLong\": ms}} and {\"$date\": ISO})
    must decode to UTC epoch microseconds in the flatten map."""
    from session_graph_ray.sources.archives import (
        parse_extended_json_timestamp,
        read_zip_conversations,
    )

    # unit: all three reference shapes + malformed fallbacks
    assert parse_extended_json_timestamp(
        {"$date": {"$numberLong": "1769019149377"}}) == 1769019149377000
    assert parse_extended_json_timestamp(
        {"$date": "2026-01-21T18:12:29.327Z"}) == 1769019149327000
    assert parse_extended_json_timestamp(
        "2026-01-21T18:12:29.327294Z") == 1769019149327294
    assert parse_extended_json_timestamp(None) is None
    assert parse_extended_json_timestamp({"$date": None}) is None
    assert parse_extended_json_timestamp({"other": 1}) is None
    assert parse_extended_json_timestamp("not-a-date") is None
    assert parse_extended_json_timestamp(
        {"$date": {"$numberLong": "oops"}}) is None

    # end-to-end: a Grok-shaped zip carrying both timestamp forms
    mapping = {
        "r": {"parent": None, "children": ["c1"],
              "message": {"role": "user", "text": "hi",
                          "create_time": {"$date":
                                          {"$numberLong": "1769019149377"}}}},
        "c1": {"parent": "r", "children": ["c2"],
               "message": {"role": "assistant", "text": "hello",
                           "create_time":
                           {"$date": "2026-01-21T18:12:30.5Z"}}},
        "c2": {"parent": "c1", "children": [],
               "message": {"role": "user", "text": "untimed"}},
    }
    z = tmp_path / "grok.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("conversations.json",
                    json.dumps([{"id": 3, "mapping": mapping}]))
    import pandas as pd

    out = read_zip_conversations(str(z)).to_pandas().sort_values("seq")
    assert out.ts_us.tolist()[:2] == [1769019149377000, 1769019150500000]
    assert pd.isna(out.ts_us.iloc[2])
