"""Watch-mode ingest loop (pipelines/watch.py, VERDICT r3 #5): drop files
into a polled directory, assignments fold incrementally, duplicate-content
drops are skipped idempotently — the reference's enqueue -> poll -> verify
shape (docker/queue_consumer.py, tests/test_integration.sh)."""

import os
import shutil
import zlib

import pandas as pd
import pyarrow.parquet as pq

from session_graph_ray.pipelines.er import run_er_pipeline
from session_graph_ray.pipelines.watch import WatchState, watch_once

BASE = "/tmp/sgr_test_watch"


def _sorted_assign(ds) -> pd.DataFrame:
    return (ds.to_pandas().sort_values("file_id")
            .reset_index(drop=True)[["file_id", "canonical_file_id"]])


def test_watch_folds_drops_and_skips_duplicates(tiny_corpus_dir):
    shutil.rmtree(BASE, ignore_errors=True)
    corpus = os.path.join(BASE, "inbox")
    out = os.path.join(BASE, "out")
    cache = os.path.join(BASE, "cache")
    os.makedirs(corpus)

    full = pq.read_table(f"{tiny_corpus_dir}/corpus")
    buckets = [zlib.crc32(p.encode()) % 3
               for p in full.column("path").to_pylist()]
    parts = [full.filter(pd.Series(buckets).eq(i).to_numpy())
             for i in range(3)]
    assert all(p.num_rows for p in parts)

    state = WatchState(os.path.join(out, "watch_manifest.json"))

    # poll 0: empty inbox — nothing happens
    os.makedirs(out, exist_ok=True)
    m = watch_once(corpus, out, state, key_cache_dir=cache)
    assert m == {"new_files": 0, "skipped_duplicates": 0,
                 "corpus_files": 0, "version": 0}

    # poll 1: first drop arrives
    pq.write_table(parts[0], os.path.join(corpus, "drop-a.parquet"))
    m = watch_once(corpus, out, state, key_cache_dir=cache)
    assert m["new_files"] == 1 and m["version"] == 1
    v1 = _sorted_assign(pd_ds(out))

    # poll 2: two more files land at once — folded in one increment
    pq.write_table(parts[1], os.path.join(corpus, "drop-b.parquet"))
    pq.write_table(parts[2], os.path.join(corpus, "drop-c.parquet"))
    m = watch_once(corpus, out, state, key_cache_dir=cache)
    assert m["new_files"] == 2 and m["version"] == 2
    v2 = _sorted_assign(pd_ds(out))
    assert len(v2) > len(v1)

    # the published assignments equal a from-scratch run over everything
    scratch = _sorted_assign(run_er_pipeline(corpus).assignments)
    assert (v2.values == scratch.values).all()

    # poll 3: a RE-DROPPED duplicate (same content, new path) is skipped —
    # no fold, no version bump, assignments untouched
    pq.write_table(parts[1], os.path.join(corpus, "drop-b-again.parquet"))
    m = watch_once(corpus, out, state, key_cache_dir=cache)
    assert m["new_files"] == 0
    assert m["skipped_duplicates"] == 1
    assert m["version"] == 2
    assert (_sorted_assign(pd_ds(out)).values == v2.values).all()

    # poll 4: idle — the duplicate was remembered (stat-gated, no re-hash)
    m = watch_once(corpus, out, state, key_cache_dir=cache)
    assert m == {"new_files": 0, "skipped_duplicates": 0,
                 "corpus_files": 3, "version": 2}

    # a RESTARTED watch (fresh state object) resumes from the manifest
    state2 = WatchState(os.path.join(out, "watch_manifest.json"))
    m = watch_once(corpus, out, state2, key_cache_dir=cache)
    assert m["new_files"] == 0 and m["version"] == 2


def pd_ds(out_dir):
    from session_graph_ray.pipelines.watch import _read_current_assignments

    ds = _read_current_assignments(out_dir)
    assert ds is not None
    return ds
