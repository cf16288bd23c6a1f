"""Binary-archive source + nested-conversation-tree flattener.

Reference semantics:
- S2/S3: the DeepSeek / Grok readers open a ZIP export and load a JSON
  member (``/root/reference/pipeline/deepseek_to_rdf.py:41-63``,
  ``grok_to_rdf.py:42-93``). Re-expressed Ray-Data-first:
  ``read_binary_files`` ships each archive to a task; a ``flat_map``-shaped
  ``map_batches`` decodes the member and explodes 1 archive -> N
  conversation rows — archives parallelize across tasks, nothing touches
  the driver.
- M2: the conversation-tree flattener — DFS over a ``mapping`` of nodes with
  ``children``, emitting one row per message fragment in deterministic
  depth-first order (``deepseek_to_rdf.py:89-162``).
"""

from __future__ import annotations

import json
import zipfile

import pyarrow as pa

import ray.data

_OUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.int64()),
        ("seq", pa.int64()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("ts_us", pa.int64()),
    ]
)


def parse_extended_json_timestamp(ts_obj) -> "int | None":
    """Mongo extended-JSON / ISO timestamp -> UTC epoch MICROSECONDS.

    The reference's Grok reader normalizes three timestamp shapes
    (``/root/reference/pipeline/grok_to_rdf.py:50-80``):
      - ``{"$date": {"$numberLong": "<ms>"}}`` — epoch milliseconds;
      - ``{"$date": "<ISO-8601>"}``;
      - a bare ISO-8601 string.
    Anything else (including ``None`` and malformed dicts) -> ``None``.
    Integer math throughout — no float epoch that would lose sub-second
    precision at year-2026 magnitudes.
    """
    from datetime import datetime, timedelta, timezone

    if isinstance(ts_obj, dict):
        d = ts_obj.get("$date")
        if isinstance(d, dict):
            nl = d.get("$numberLong")
            try:
                return int(nl) * 1000 if nl is not None else None
            except (TypeError, ValueError):
                return None
        ts_obj = d
    if isinstance(ts_obj, str):
        try:
            dt = datetime.fromisoformat(ts_obj.replace("Z", "+00:00"))
        except ValueError:
            return None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
        return (dt - epoch) // timedelta(microseconds=1)
    return None


def flatten_conversation_tree(mapping: dict) -> list[dict]:
    """DFS flatten of a {node_id: {parent, children, message}} tree.

    Roots are nodes without a parent (or whose parent is absent from the
    mapping); children are visited in the listed order; ``seq`` numbers the
    emitted messages depth-first — the reference's traversal semantics
    (``deepseek_to_rdf.py:89-162``) without its role-merging specifics.
    A message's ``create_time`` (Mongo extended-JSON or ISO — the Grok
    export shape, ``grok_to_rdf.py:169-170``) decodes to ``ts_us`` (UTC
    epoch microseconds, null when absent/malformed).
    """
    roots = [
        nid for nid, node in mapping.items()
        if not node.get("parent") or node.get("parent") not in mapping
    ]
    out: list[dict] = []
    seq = 0
    stack = list(reversed(sorted(roots)))
    seen: set[str] = set()
    while stack:
        nid = stack.pop()
        if nid in seen or nid not in mapping:
            continue
        seen.add(nid)
        node = mapping[nid]
        msg = node.get("message")
        if msg and msg.get("text") is not None:
            out.append({
                "seq": seq,
                "role": msg.get("role", ""),
                "text": msg["text"],
                "ts_us": parse_extended_json_timestamp(
                    msg.get("create_time")),
            })
            seq += 1
        for child in reversed(node.get("children", [])):
            stack.append(child)
    return out


def read_zip_conversations(
    paths: str | list[str], member: str = "conversations.json"
) -> "ray.data.Dataset":
    """ZIP archives -> flattened message rows (conv_id, seq, role, text).

    The JSON member holds ``[{"id": int, "mapping": {...}}, ...]``; each
    conversation's tree is DFS-flattened. One archive = one task; a corpus
    of many archives streams through the pool.
    """
    blobs = ray.data.read_binary_files(paths)

    def explode(batch: pa.Table) -> pa.Table:
        conv_ids: list[int] = []
        seqs: list[int] = []
        roles: list[str] = []
        texts: list[str] = []
        ts_us: list[int | None] = []
        for payload in batch.column("bytes").to_pylist():
            import io

            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                convs = json.loads(zf.read(member))
            for conv in convs:
                for row in flatten_conversation_tree(conv["mapping"]):
                    conv_ids.append(int(conv["id"]))
                    seqs.append(row["seq"])
                    roles.append(row["role"])
                    texts.append(row["text"])
                    ts_us.append(row["ts_us"])
        return pa.table(
            {
                "conv_id": pa.array(conv_ids, pa.int64()),
                "seq": pa.array(seqs, pa.int64()),
                "role": pa.array(roles, pa.string()),
                "text": pa.array(texts, pa.string()),
                "ts_us": pa.array(ts_us, pa.int64()),
            }
        )

    return blobs.map_batches(explode, batch_format="pyarrow", batch_size=1)
