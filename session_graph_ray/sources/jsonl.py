"""JSONL source with malformed-row quarantine + JSONL sink.

Reference semantics:
- S1: the Claude JSONL reader silently SKIPS malformed lines
  (``/root/reference/pipeline/jsonl_to_rdf.py:59-77``); M10 salvages what it
  can and quarantines the rest instead of crashing
  (``triple_extraction.py:390-514``). Here every line parses inside
  ``map_batches``; bad lines become rows in an error channel (``_error``
  column) rather than task failures — row-level quarantine, the
  distributed-retry-friendly form (SURVEY.md §4 retries row).
- K3: the batch-request JSONL writer (``bulk_batch.py:221-258``) becomes
  ``Dataset.write_json`` via :func:`write_jsonl`.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data


def read_jsonl_robust(
    paths: str | list[str],
    fields: dict[str, pa.DataType],
) -> "ray.data.Dataset":
    """Line-delimited JSON -> Dataset with quarantine.

    ``fields`` declares the projected output schema (name -> arrow type);
    parsed objects contribute those keys (missing -> null). Output carries
    every input line exactly once: good rows have ``_error == null``, bad
    lines keep their raw text in ``_raw`` with the parse error in
    ``_error``. Filter ``_error is null`` for the clean view, the inverse
    for the quarantine table (the reference logs-and-skips; we keep the
    evidence queryable).
    """
    lines = ray.data.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        txt = batch.column("text").to_pylist()
        cols: dict[str, list] = {name: [] for name in fields}
        raws: list[str | None] = []
        errs: list[str | None] = []
        for line in txt:
            if not line.strip():
                continue
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("JSONL line is not an object")
            except (json.JSONDecodeError, ValueError) as e:
                for name in fields:
                    cols[name].append(None)
                raws.append(line[:500])
                errs.append(f"{type(e).__name__}: {e}")
                continue
            for name in fields:
                v = obj.get(name)
                cols[name].append(v)
            raws.append(None)
            errs.append(None)
        out = {
            name: pa.array(cols[name], type=t) for name, t in fields.items()
        }
        out["_raw"] = pa.array(raws, pa.string())
        out["_error"] = pa.array(errs, pa.string())
        return pa.table(out)

    return lines.map_batches(parse, batch_format="pyarrow")


def clean_rows(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.is_null(t["_error"])).drop_columns(["_raw", "_error"]),
        batch_format="pyarrow",
    )


def quarantined_rows(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["_error"])).select(["_raw", "_error"]),
        batch_format="pyarrow",
    )


def write_jsonl(ds: "ray.data.Dataset", path: str) -> None:
    """Partitioned JSONL sink (one file per block — resumable-output rule)."""
    ds.write_json(path)
