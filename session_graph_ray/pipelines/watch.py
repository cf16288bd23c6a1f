"""Queue-driven ingest loop: poll a directory, fold new files through the
incremental ER pipeline, skip duplicates idempotently.

Reference semantic: the continuous operational mode — a stop hook enqueues
an arriving export, a consumer loop processes one item at a time and an
already-seen item is skipped by its content hash
(``/root/reference/hooks/stop_hook.sh:49-69``,
``/root/reference/docker/queue_consumer.py:128-184``,
``/root/reference/pipeline/bulk_process.py:83-99`` sha256 watermark).

Ray-Data form (VERDICT r3 #5): a driver loop a user can leave running.
Each poll:

  1. list ``*.parquet`` under the corpus dir (``sources.paths``);
  2. a file whose (path, size, mtime) is already in the manifest is
     untouched (zero I/O); otherwise its content sha256 decides — a hash
     seen before is a DUPLICATE drop and is skipped forever (the
     reference's watermark), a fresh hash is a NEW file;
  3. new files fold through :func:`run_er_incremental` against the
     previous assignments (``state.filecache.FileGrainCache`` keeps the
     scan delta-only); the very first batch runs from empty assignments —
     the incremental pipeline degenerates to a from-scratch run exactly
     (pinned by tests/test_er_incremental.py);
  4. assignments land in a VERSIONED directory + an atomically-replaced
     ``CURRENT`` pointer file, so a kill mid-write never corrupts the
     previous state and a restarted watch resumes from the manifest.

Effects are exactly-once at file grain: re-dropping a processed or
duplicate file is a manifest hit, nothing recomputes, assignments are
unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa

import ray.data


def _sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _stat_key(path: str) -> str:
    st = os.stat(path)
    return f"{path}|{st.st_size}|{int(st.st_mtime)}"


class WatchState:
    """Content-hash manifest persisted as an atomically-replaced JSON file.

    ``shas``: sha256 -> first path carrying that content (the corpus
    member). ``stats``: (path,size,mtime) -> sha256, so an unchanged path
    never re-hashes on later polls. ``version``: monotone assignments
    version for the CURRENT pointer."""

    def __init__(self, path: str):
        self.path = path
        self.shas: dict[str, str] = {}
        self.stats: dict[str, str] = {}
        self.version = 0
        if os.path.exists(path):
            d = json.load(open(path))
            self.shas = d.get("shas", {})
            self.stats = d.get("stats", {})
            self.version = int(d.get("version", 0))

    def save(self) -> None:
        tmp = f"{self.path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"shas": self.shas, "stats": self.stats,
                       "version": self.version}, f)
        os.replace(tmp, self.path)


def _read_current_assignments(out_dir: str) -> "ray.data.Dataset | None":
    cur = os.path.join(out_dir, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        name = f.read().strip()
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        return None
    return ray.data.read_parquet(d)


def _empty_assignments() -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table({
        "file_id": pa.array([], pa.string()),
        "canonical_file_id": pa.array([], pa.string()),
    }))


def watch_once(
    corpus_dir: str,
    out_dir: str,
    state: WatchState,
    cfg=None,
    key_cache_dir: str | None = None,
) -> dict:
    """One poll: classify arrivals, fold new files, publish assignments.

    Returns poll metrics: ``new_files`` (folded this poll),
    ``skipped_duplicates`` (fresh paths whose content was already seen),
    ``corpus_files``, ``version`` and — when a fold ran — the incremental
    pipeline's own metrics under ``fold``."""
    from ..sources.paths import filtered_paths
    from .er_incremental import run_er_incremental

    os.makedirs(out_dir, exist_ok=True)
    new_files: list[str] = []
    skipped: list[str] = []
    for p in filtered_paths(corpus_dir):
        sk = _stat_key(p)
        if sk in state.stats:
            continue  # processed (or recorded duplicate): zero further I/O
        sha = _sha256_file(p)
        state.stats[sk] = sha
        if sha in state.shas:
            skipped.append(p)  # the reference's watermark skip
        else:
            state.shas[sha] = p
            new_files.append(p)

    out: dict = {
        "new_files": len(new_files),
        "skipped_duplicates": len(skipped),
        "corpus_files": len(state.shas),
        "version": state.version,
    }
    if not new_files:
        state.save()  # persist duplicate records even on no-fold polls
        return out

    # corpus = one path per distinct content hash, sorted for determinism
    corpus_files = sorted(state.shas.values())
    prev = _read_current_assignments(out_dir) or _empty_assignments()
    res = run_er_incremental(corpus_files, prev, cfg=cfg,
                             key_cache_dir=key_cache_dir)

    state.version += 1
    vname = f"assignments-v{state.version:06d}"
    vdir = os.path.join(out_dir, vname)
    tmp = f"{vdir}.tmp-{os.getpid()}"
    res.assignments.write_parquet(tmp)
    os.replace(tmp, vdir)
    cur_tmp = os.path.join(out_dir, f"CURRENT.tmp-{os.getpid()}")
    with open(cur_tmp, "w") as f:
        f.write(vname)
    os.replace(cur_tmp, os.path.join(out_dir, "CURRENT"))
    state.save()

    out["version"] = state.version
    out["assignment_rows"] = res.assignments.count()
    out["fold"] = res.metrics.get("incremental", {})
    return out


def watch_loop(
    corpus_dir: str,
    out_dir: str,
    cfg=None,
    key_cache_dir: str | None = None,
    poll_interval: float = 5.0,
    max_polls: int | None = None,
    stop_file: str | None = None,
    on_poll=None,
) -> int:
    """Poll forever (or ``max_polls`` times / until ``stop_file`` exists).
    Returns the number of polls executed. ``on_poll(metrics)`` is invoked
    after each poll (the CLI prints one JSON line per poll)."""
    os.makedirs(out_dir, exist_ok=True)
    state = WatchState(os.path.join(out_dir, "watch_manifest.json"))
    polls = 0
    while True:
        m = watch_once(corpus_dir, out_dir, state, cfg=cfg,
                       key_cache_dir=key_cache_dir)
        polls += 1
        if on_poll is not None:
            on_poll(m)
        if max_polls is not None and polls >= max_polls:
            return polls
        if stop_file is not None and os.path.exists(stop_file):
            return polls
        time.sleep(poll_interval)
