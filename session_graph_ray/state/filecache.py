"""File-grain derived-table cache: derive once per INPUT FILE, reuse forever.

Reference semantic: the bulk processor's sha256 watermark store means an
unchanged input file is never re-read on a later run
(``/root/reference/pipeline/bulk_process.py:83-99``). Promoted here to
derived-TABLE grain: a stage whose output is a pure per-row function of one
input file (blocking keys, normalized features) caches that output per file,
keyed by (path, size, mtime, config fingerprint). An incremental run then
derives only for files it has never seen — the 100-TB shape where a daily
increment touches 0.1% of partitions and the other 99.9% cost one directory
listing (VERDICT r2 #4: delta-only incremental blocking).

Cache layout: ``root/<tag>/<fp24>/*.parquet`` — one directory per input
file, written atomically (tmp dir + rename) so a killed run never leaves a
half-cached entry a later run would trust. The returned dataset is a plain
``read_parquet`` over all entry dirs: lineage starts at the cache, nothing
upstream re-executes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _pin_fsspec_http_probe() -> None:
    """Make Ray's per-read_parquet fsspec-HTTP probe thread-safe.

    Ray's path resolution tries ``from fsspec.implementations.http import
    HTTPFileSystem`` on EVERY read/write path resolution. In environments
    without aiohttp that import always fails — and two threads racing the
    failing import hit a CPython artifact where the loser raises
    ``ImportError: cannot import name 'HTTPFileSystem'`` instead of the
    ``ModuleNotFoundError`` Ray catches, killing a concurrent per-file
    derive (reproduced with plain concurrent ``read_parquet`` calls).
    If the module is unimportable, pin a sentinel whose HTTPFileSystem no
    filesystem can be an instance of — semantically exact here (without
    aiohttp an HTTP filesystem cannot exist), and the probe becomes a
    cached, race-free module lookup."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    if "fsspec.implementations.http" in sys.modules:
        return
    mod = types.ModuleType("fsspec.implementations.http")

    class _NoHTTPFileSystem:  # sentinel: isinstance(...) is always False
        pass

    mod.HTTPFileSystem = _NoHTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def _entry_fp(path: str, cfg_fp: str) -> str:
    st = os.stat(path)
    h = hashlib.sha256(
        f"{path}|{st.st_size}|{int(st.st_mtime)}|{cfg_fp}".encode()
    )
    return h.hexdigest()[:24]


def _ensure_nonempty(dirpath: str, schema: "pa.Schema | None") -> None:
    """write_parquet emits zero files for an empty dataset; persist an
    explicit empty file so a later read_parquet round-trips the schema.
    A derive with NO recoverable schema is a caller bug — raise rather
    than cache a placeholder schema that would poison the combined
    read_parquet over all entries forever (atomic writes are trusted)."""
    os.makedirs(dirpath, exist_ok=True)
    if any(n.endswith(".parquet") for n in os.listdir(dirpath)):
        return
    if schema is None or not schema.names:
        raise ValueError(
            "file-grain derive produced an empty dataset with no schema; "
            "derive() must yield a schema even for zero rows"
        )
    tbl = pa.schema(list(zip(schema.names, schema.types))).empty_table()
    pq.write_table(tbl, os.path.join(dirpath, "part-empty.parquet"))


class FileGrainCache:
    """Per-input-file cache of a derived Dataset stage."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def dataset(
        self,
        files: list[str],
        tag: str,
        cfg_fp: str,
        derive: Callable[[str], "ray.data.Dataset"],
    ) -> tuple["ray.data.Dataset", dict]:
        """Derived table for ``files``, deriving only cache misses.

        ``derive(path)`` must be a pure per-file function (rows of the
        output depend only on rows of that one input file + config) — the
        contract that makes file-grain reuse exact. Returns (dataset over
        ALL files' cached entries, metrics dict). On a shared filesystem a
        concurrent run deriving the same entry is harmless: writes are
        atomic renames of identical content."""
        tag_dir = os.path.join(self.root, tag)
        os.makedirs(tag_dir, exist_ok=True)
        entry_dirs: list[str] = []
        misses: list[tuple[str, str]] = []
        for path in sorted(files):
            ent = os.path.join(tag_dir, _entry_fp(path, cfg_fp))
            if not os.path.isdir(ent):
                misses.append((path, ent))
            entry_dirs.append(ent)

        def fill(path: str, ent: str) -> None:
            # materialize ONCE: the write and the (empty-case) schema both
            # read the pinned blocks — no second lineage execution
            out = derive(path).materialize()
            tmp = f"{ent}.tmp-{os.getpid()}"
            shutil.rmtree(tmp, ignore_errors=True)
            out.write_parquet(tmp)
            _ensure_nonempty(tmp, out.schema())
            try:
                os.replace(tmp, ent)
            except OSError:
                if not os.path.isdir(ent):  # not a lost race: real error
                    raise
                shutil.rmtree(tmp, ignore_errors=True)

        if len(misses) > 1:
            # a cold cache over many files would otherwise run F sequential
            # Ray jobs (each parallel only WITHIN one file); a small thread
            # pool keeps several per-file pipelines in flight — Ray Data
            # executions are independent and share the cluster's resource
            # budget, so this overlaps read/derive/write across files
            _pin_fsspec_http_probe()
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(misses))) as ex:
                list(ex.map(lambda pe: fill(*pe), misses))
        elif misses:
            fill(*misses[0])
        derived = len(misses)
        # expand entries to files: read_parquet accepts a dir OR a file
        # list, but not a list of dirs
        parts = [
            os.path.join(ent, n)
            for ent in entry_dirs
            for n in sorted(os.listdir(ent))
            if n.endswith(".parquet")
        ]
        ds = ray.data.read_parquet(parts)
        return ds, {"files_total": len(files), "files_derived": derived}
