"""Stage 0 — normalize: identity, hashes, key-derivation features.

Zero-copy Arrow ``map_batches`` projections. Two layers:

- ``normalize_core`` (cheap; consumed by the blocking stage): per row
  ``file_id`` (sha256(repo|path|commit)[:16] hex — deterministic identity,
  reference analog ``/root/reference/pipeline/common.py:29-36``),
  ``file_id_u64`` / ``sha_u64`` — the same identities as uint64 (first 8
  digest bytes), so every downstream shuffle moves 8-byte ints, not strings;
  ``content_sha256`` (the per-row invariant, reference analog: file
  watermarks, ``/root/reference/pipeline/bulk_process.py:83-89``);
  ``lang_norm`` / ``stem_norm`` / ``scorable``.
- ``enrich_features`` (adds the scorer's feature columns: identifier token
  sets, truncated content — reference analog: 2000-char content cap,
  ``common.py:149-150``). Only the features stage pays for these.

Stateless — plain functions, so Ray schedules elastic tasks, not actors.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.text import (
    canonical_lang,
    identifier_tokens,
    is_scorable_content,
    normalize_stem,
    path_stem,
)

TRUNC_CHARS = 256
TOKEN_CAP = 200


def normalize_core_batch(batch: pa.Table) -> pa.Table:
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    lang = batch.column("lang").to_pylist()
    content = batch.column("content").to_pylist()

    n = len(repo)
    fid_hex: list[str] = []
    fid_u64 = np.empty(n, dtype=np.uint64)
    sha_hex: list[str] = []
    sha_u64 = np.empty(n, dtype=np.uint64)
    for i in range(n):
        d = hashlib.sha256(
            f"{repo[i]}|{path[i]}|{commit[i]}".encode("utf-8", errors="surrogatepass")
        ).digest()
        fid_hex.append(d[:8].hex())
        fid_u64[i] = int.from_bytes(d[:8], "big")
        c = content[i] if content[i] is not None else ""
        dc = hashlib.sha256(c.encode("utf-8", errors="surrogatepass")).digest()
        sha_hex.append(dc.hex())
        sha_u64[i] = int.from_bytes(dc[:8], "big")

    lang_norm = [canonical_lang(lang[i]) for i in range(n)]
    stem_norm = [normalize_stem(path_stem(path[i])) for i in range(n)]
    scorable = [is_scorable_content(content[i]) for i in range(n)]

    out = batch.append_column("file_id", pa.array(fid_hex, pa.string()))
    out = out.append_column("file_id_u64", pa.array(fid_u64, pa.uint64()))
    out = out.append_column("content_sha256", pa.array(sha_hex, pa.string()))
    out = out.append_column("sha_u64", pa.array(sha_u64, pa.uint64()))
    out = out.append_column("lang_norm", pa.array(lang_norm, pa.string()))
    out = out.append_column("stem_norm", pa.array(stem_norm, pa.string()))
    out = out.append_column("scorable", pa.array(scorable, pa.bool_()))
    return out


def enrich_features_batch(batch: pa.Table) -> pa.Table:
    content = batch.column("content").to_pylist()
    scorable = batch.column("scorable").to_pylist()
    n = len(content)
    tokens = [
        identifier_tokens(content[i], cap=TOKEN_CAP) if scorable[i] else []
        for i in range(n)
    ]
    trunc = [
        (content[i][:TRUNC_CHARS] if content[i] is not None else "") for i in range(n)
    ]

    out = batch.append_column("tokens", pa.array(tokens, pa.list_(pa.string())))
    # join-safe serialized forms: Arrow acero joins reject list<> payload
    # columns. tokens_bin = sorted crc32 hashes packed little-endian uint32 —
    # compact through shuffles and zero-parse for the scorer's np.intersect1d
    from ..functions.hashing import crc32_np

    out = out.append_column(
        "tokens_str", pa.array(["\x1f".join(t) for t in tokens], pa.string())
    )
    out = out.append_column(
        "tokens_bin",
        pa.array(
            [
                np.unique(crc32_np(t)).astype("<u4").tobytes() if t else b""
                for t in tokens
            ],
            pa.binary(),
        ),
    )
    out = out.append_column("content_trunc", pa.array(trunc, pa.string()))
    out = out.append_column(
        "n_chars",
        pc.cast(pc.utf8_length(pc.cast(batch.column("content"), pa.large_string())), pa.int64()),
    )
    return out


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Full projection (core + features) — kept for tests and callers that
    want everything in one pass."""
    return enrich_features_batch(normalize_core_batch(batch))


def normalize_core(ds: "ray.data.Dataset", batch_size: int = 2048) -> "ray.data.Dataset":
    """The cheap identity/key projection. Keeps ``content`` (blocking needs
    it for shingling); downstream stages must project it away before shuffles
    (wide-row rule, SURVEY.md §7.4)."""
    return ds.map_batches(
        normalize_core_batch, batch_format="pyarrow", batch_size=batch_size
    )


def normalize(ds: "ray.data.Dataset", batch_size: int = 2048) -> "ray.data.Dataset":
    return ds.map_batches(normalize_batch, batch_format="pyarrow", batch_size=batch_size)


def features_view(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """The compact per-file feature table carried through shuffles/joins —
    ``content`` projected away (it dominates memory at 100 TB scale)."""
    return ds.select_columns(
        ["file_id", "file_id_u64", "content_sha256", "sha_u64", "lang_norm",
         "stem_norm", "tokens_bin", "content_trunc", "scorable"]
    )
