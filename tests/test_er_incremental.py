"""Incremental ER == from-scratch ER, bit-for-bit.

Split the tiny fixture corpus ~80/20 by a content-independent hash of the
path, run the full pipeline on the 80% ("yesterday"), then fold the full
corpus in incrementally and compare against a from-scratch run on 100%.
"""

import os
import shutil
import zlib

import pandas as pd
import pyarrow.parquet as pq

from session_graph_ray.pipelines.er import run_er_pipeline
from session_graph_ray.pipelines.er_incremental import run_er_incremental

BASE = "/tmp/sgr_test_incr"


def _split_corpus(tiny_corpus_dir):
    shutil.rmtree(BASE, ignore_errors=True)
    prev_dir = os.path.join(BASE, "prev_corpus")
    os.makedirs(prev_dir)
    full = pq.read_table(f"{tiny_corpus_dir}/corpus").to_pandas()
    keep = full["path"].map(lambda p: zlib.crc32(p.encode()) % 5 != 0)
    prev = full[keep]
    assert 0 < len(prev) < len(full)
    pq.write_table(
        pq.read_table(f"{tiny_corpus_dir}/corpus").filter(keep.to_numpy()),
        os.path.join(prev_dir, "part-0.parquet"),
    )
    return prev_dir, len(full) - len(prev)


def _sorted_assign(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values("file_id")
        .reset_index(drop=True)[["file_id", "canonical_file_id"]]
    )


def test_incremental_equals_full(tiny_corpus_dir):
    prev_dir, n_new = _split_corpus(tiny_corpus_dir)

    prev = run_er_pipeline(prev_dir)
    full = run_er_pipeline(f"{tiny_corpus_dir}/corpus")
    incr = run_er_incremental(f"{tiny_corpus_dir}/corpus", prev.assignments)

    a_full = _sorted_assign(full.assignments)
    a_incr = _sorted_assign(incr.assignments)
    assert len(a_full) == len(a_incr)
    assert (a_full["file_id"].values == a_incr["file_id"].values).all()
    assert (
        a_full["canonical_file_id"].values == a_incr["canonical_file_id"].values
    ).all()

    # the delta actually was a delta: scored pairs exclude old-old pairs
    m = incr.metrics["incremental"]
    assert m["prev_rows"] > 0
    assert m["pairs_scored"] <= full.pairs.count()


def test_incremental_from_empty_prev(tiny_corpus_dir):
    """Empty previous assignments -> incremental degenerates to a full run."""
    import ray.data as rd
    import pyarrow as pa

    empty = rd.from_arrow(
        pa.table({"file_id": pa.array([], pa.string()),
                  "canonical_file_id": pa.array([], pa.string())})
    )
    full = run_er_pipeline(f"{tiny_corpus_dir}/corpus")
    incr = run_er_incremental(f"{tiny_corpus_dir}/corpus", empty)
    a_full, a_incr = _sorted_assign(full.assignments), _sorted_assign(incr.assignments)
    assert (a_full.values == a_incr.values).all()


def test_incremental_key_cache_delta_only(tiny_corpus_dir):
    """With key_cache_dir set, an increment derives blocking keys/features
    only for input files never seen before, and assignments still equal a
    from-scratch run (VERDICT r2 #4)."""
    import pyarrow as pa
    import ray.data as rd

    base = "/tmp/sgr_test_keycache"
    shutil.rmtree(base, ignore_errors=True)
    corpus = os.path.join(base, "corpus")
    cache = os.path.join(base, "cache")
    os.makedirs(corpus)

    full = pq.read_table(f"{tiny_corpus_dir}/corpus")
    keep = pd.Series(
        [zlib.crc32(p.encode()) % 5 != 0 for p in full.column("path").to_pylist()]
    )
    pq.write_table(full.filter(keep.to_numpy()),
                   os.path.join(corpus, "part-a.parquet"))

    empty = rd.from_arrow(
        pa.table({"file_id": pa.array([], pa.string()),
                  "canonical_file_id": pa.array([], pa.string())})
    )
    incr1 = run_er_incremental(corpus, empty, key_cache_dir=cache)
    m1 = incr1.metrics["incremental"]
    assert m1["block_keys"] == {"files_total": 1, "files_derived": 1}
    assert m1["features"] == {"files_total": 1, "files_derived": 1}

    # day 2: one NEW file lands next to the unchanged old one
    pq.write_table(full.filter((~keep).to_numpy()),
                   os.path.join(corpus, "part-b.parquet"))
    incr2 = run_er_incremental(corpus, incr1.assignments, key_cache_dir=cache)
    m2 = incr2.metrics["incremental"]
    assert m2["block_keys"] == {"files_total": 2, "files_derived": 1}
    assert m2["features"] == {"files_total": 2, "files_derived": 1}

    scratch = run_er_pipeline(corpus)
    a_full, a_incr = _sorted_assign(scratch.assignments), _sorted_assign(
        incr2.assignments)
    assert (a_full.values == a_incr.values).all()


def test_incremental_semi_join_gate(tiny_corpus_dir):
    """Forcing incremental_broadcast_max_ids=0 routes the old-vs-old pair
    drop through the bucketed left-join flag path; outputs are unchanged
    (VERDICT r2 #5)."""
    from dataclasses import replace

    from session_graph_ray.config import auto_config

    prev_dir, _ = _split_corpus(tiny_corpus_dir)
    prev = run_er_pipeline(prev_dir)
    cfg = auto_config()
    base = run_er_incremental(f"{tiny_corpus_dir}/corpus", prev.assignments,
                              cfg=cfg)
    gated = run_er_incremental(
        f"{tiny_corpus_dir}/corpus", prev.assignments,
        cfg=replace(cfg, incremental_broadcast_max_ids=0),
    )
    a, b = _sorted_assign(base.assignments), _sorted_assign(gated.assignments)
    assert (a.values == b.values).all()
