"""Stage 0 — normalize: identity, hashes, key-derivation features.

Zero-copy Arrow ``map_batches`` projection adding to every corpus row:

- ``file_id``         sha256(repo|path|commit)[:16]  (deterministic identity,
                      reference analog ``/root/reference/pipeline/common.py:29-36``)
- ``content_sha256``  the per-row invariant (reference analog: file watermarks,
                      ``/root/reference/pipeline/bulk_process.py:83-89``)
- ``lang_norm``       closed-vocabulary lang canonicalization
- ``stem_norm``       normalized path stem (vendor prefixes stripped)
- ``tokens``          distinct identifier tokens (list<string>, capped)
- ``content_trunc``   first 256 chars (Levenshtein feature input; reference
                      analog: 2000-char cap ``common.py:149-150``)
- ``n_chars``, ``scorable``

Stateless — a plain function, so Ray schedules elastic tasks, not actors.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import file_id_of, sha256_hex
from ..functions.text import (
    canonical_lang,
    identifier_tokens,
    is_scorable_content,
    normalize_stem,
    path_stem,
)

TRUNC_CHARS = 256
TOKEN_CAP = 200


def normalize_batch(batch: pa.Table) -> pa.Table:
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    lang = batch.column("lang").to_pylist()
    content = batch.column("content").to_pylist()

    n = len(repo)
    file_id = [file_id_of(repo[i], path[i], commit[i]) for i in range(n)]
    sha = [sha256_hex(content[i] if content[i] is not None else "") for i in range(n)]
    lang_norm = [canonical_lang(lang[i]) for i in range(n)]
    stem_norm = [normalize_stem(path_stem(path[i])) for i in range(n)]
    scorable = [is_scorable_content(content[i]) for i in range(n)]
    tokens = [
        identifier_tokens(content[i], cap=TOKEN_CAP) if scorable[i] else []
        for i in range(n)
    ]
    trunc = [
        (content[i][:TRUNC_CHARS] if content[i] is not None else "") for i in range(n)
    ]

    out = batch.append_column("file_id", pa.array(file_id, pa.string()))
    out = out.append_column("content_sha256", pa.array(sha, pa.string()))
    out = out.append_column("lang_norm", pa.array(lang_norm, pa.string()))
    out = out.append_column("stem_norm", pa.array(stem_norm, pa.string()))
    out = out.append_column("tokens", pa.array(tokens, pa.list_(pa.string())))
    # join-safe serialized forms: Arrow acero joins reject list<> payload
    # columns. tokens_bin = sorted crc32 hashes packed little-endian uint32 —
    # compact through shuffles and zero-parse for the scorer's np.intersect1d
    out = out.append_column(
        "tokens_str", pa.array(["\x1f".join(t) for t in tokens], pa.string())
    )
    from ..functions.hashing import crc32_np
    import numpy as np

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
    out = out.append_column("scorable", pa.array(scorable, pa.bool_()))
    return out


def normalize(ds: "ray.data.Dataset", batch_size: int = 2048) -> "ray.data.Dataset":
    """Apply the normalize projection. Keeps ``content`` (blocking needs it
    for shingling); downstream stages must project it away before shuffles
    (wide-row rule, SURVEY.md §7.4)."""
    return ds.map_batches(normalize_batch, batch_format="pyarrow", batch_size=batch_size)


def features_view(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """The compact per-file feature table carried through shuffles/joins —
    ``content`` projected away (it dominates memory at 100 TB scale)."""
    return ds.select_columns(
        ["file_id", "content_sha256", "lang_norm", "stem_norm", "tokens_bin",
         "content_trunc", "scorable"]
    )
