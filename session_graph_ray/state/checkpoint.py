"""Per-stage, per-partition Parquet checkpoints with a run manifest.

Reference semantics promoted to partition grain (SURVEY.md §7.4 hard part 6):

- file-level sha256 watermarks -> stage fingerprint = hash of (input file
  list, sizes, config); a stage whose fingerprint matches the manifest is
  skipped and its output re-read (``/root/reference/pipeline/bulk_process.py:68-99``)
- SQLite record caches incl. negatives -> the scores checkpoint stores every
  scored pair, matches and non-matches (``link_entities.py:283-329``)
- job manifest JSON -> ``manifest.json`` with per-stage status, per-partition
  file inventory (path, rows, bytes) and stage metrics
  (``/root/reference/pipeline/bulk_batch.py:122-150``)

Writes are atomic: data lands in ``<stage>.tmp-<pid>`` and is renamed into
place before the manifest records completion, so a killed run never leaves a
half-written stage that a resume would trust.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow.parquet as pq

import ray.data


def input_fingerprint(paths: list[str], extra: str = "") -> str:
    """Stable hash of input file identities + config, the resume key."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{int(st.st_mtime)}".encode())
    h.update(extra.encode())
    return h.hexdigest()[:32]


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "manifest.json")
        self.manifest = self._load_manifest()

    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"stages": {}}

    def _flush_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2)
        os.replace(tmp, self.manifest_path)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_done(self, stage: str, fingerprint: str) -> bool:
        ent = self.manifest["stages"].get(stage)
        return (
            ent is not None
            and ent.get("status") == "done"
            and ent.get("fingerprint") == fingerprint
            and os.path.isdir(self.stage_dir(stage))
        )

    def load(self, stage: str) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.stage_dir(stage))

    def save(
        self,
        stage: str,
        ds: "ray.data.Dataset",
        fingerprint: str,
        metrics: dict | None = None,
    ) -> "ray.data.Dataset":
        """Write stage output, record per-partition lineage, return a dataset
        re-read from the checkpoint (truncates upstream lineage)."""
        final = self.stage_dir(stage)
        tmp = f"{final}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        if not os.path.isdir(tmp):
            # empty stage output (e.g. no match edges on an all-singleton
            # corpus) may produce zero files; persist an explicit empty
            # parquet so resume's read_parquet() round-trips the schema
            os.makedirs(tmp, exist_ok=True)
        if not any(n.endswith(".parquet") for n in os.listdir(tmp)):
            import pyarrow as pa

            schema = ds.schema()
            tbl = (
                pa.schema(
                    [(n, t) for n, t in zip(schema.names, schema.types)]
                ).empty_table()
                if schema is not None and schema.names
                else pa.table({"__empty": pa.array([], pa.int8())})
            )
            pq.write_table(tbl, os.path.join(tmp, "part-empty.parquet"))
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)

        partitions = []
        total_rows = 0
        for name in sorted(os.listdir(final)):
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(final, name)
            md = pq.read_metadata(fp)
            partitions.append(
                {"file": name, "rows": md.num_rows, "bytes": os.path.getsize(fp)}
            )
            total_rows += md.num_rows
        self.manifest["stages"][stage] = {
            "status": "done",
            "fingerprint": fingerprint,
            "completed_at": time.time(),
            "rows": total_rows,
            "partitions": partitions,
            "metrics": metrics or {},
        }
        self._flush_manifest()
        return ray.data.read_parquet(final)

    def annotate(self, stage: str, metrics: dict) -> None:
        """Attach/merge metrics onto an already-recorded stage (e.g. the
        blocking truncation counters, which are only known after the pairs
        stage materializes)."""
        ent = self.manifest["stages"].get(stage)
        if ent is None:
            return
        ent.setdefault("metrics", {}).update(metrics)
        self._flush_manifest()

    def invalidate_from(self, stage: str, order: list[str]) -> None:
        """Drop a stage and everything after it (used by resume tests)."""
        if stage not in order:
            return
        for s in order[order.index(stage) :]:
            self.manifest["stages"].pop(s, None)
            shutil.rmtree(self.stage_dir(s), ignore_errors=True)
        self._flush_manifest()

    def stage_metrics(self) -> dict:
        return {
            s: {"rows": e.get("rows"), **e.get("metrics", {})}
            for s, e in self.manifest["stages"].items()
        }
