"""Read-time path-predicate tests (SURVEY.md F4 — excluded partitions never
schedule read tasks)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from session_graph_ray.sources.paths import filtered_paths


def _write(dirpath, name, ids):
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64())}),
        os.path.join(dirpath, name),
    )


def test_filtered_paths_excludes_partitions(tmp_path):
    root = str(tmp_path / "sessions")
    _write(f"{root}/main", "a.parquet", [1, 2])
    _write(f"{root}/subagents", "b.parquet", [3, 4])
    _write(f"{root}/main", "c.parquet", [5])

    paths = filtered_paths(root, exclude_substrings=("/subagents/",))
    assert len(paths) == 2
    assert all("/subagents/" not in p for p in paths)

    out = rd.read_parquet(paths).to_pandas()
    assert sorted(out["id"]) == [1, 2, 5]


def test_filtered_paths_glob_and_suffix(tmp_path):
    root = str(tmp_path / "mix")
    _write(root, "x.parquet", [1])
    with open(f"{root}/notes.txt", "w") as f:
        f.write("not data")
    assert filtered_paths(f"{root}/*") == [f"{root}/x.parquet"]
