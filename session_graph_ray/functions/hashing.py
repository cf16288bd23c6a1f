"""Deterministic hashing kernels.

Reference analogs: md5 triple id (``/root/reference/pipeline/common.py:206-209``),
sha256 file watermarks (``/root/reference/pipeline/bulk_process.py:83-89``),
sha256[:16] text hash (``/root/reference/pipeline/triple_extraction.py:62``).

Everything here is process-independent (no salted ``hash()``) so that outputs
are stable across Ray workers and across runs — a requirement for the
per-row ``content_sha256`` invariant and for resumable checkpoints.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8", errors="surrogatepass")).hexdigest()


def file_id_of(repo: str, path: str, commit: str) -> str:
    """Stable 16-hex-char row identity: sha256("repo|path|commit")[:16].

    Mirrors the reference's deterministic value-derived identity
    (``/root/reference/pipeline/common.py:29-36``) on the code-corpus key.
    """
    return sha256_hex(f"{repo}|{path}|{commit}")[:16]


def sha256_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 hex digest of every string in an Arrow column.

    hashlib releases the GIL-bound work to C; a list comprehension over
    ``as_py`` strings is the practical fast path (Arrow ships no sha kernel).
    """
    out = [
        hashlib.sha256(s.encode("utf-8", errors="surrogatepass")).hexdigest()
        if s is not None
        else None
        for s in col.to_pylist()
    ]
    return pa.array(out, type=pa.string())


def file_id_column(repo: pa.Array, path: pa.Array, commit: pa.Array) -> pa.Array:
    out = [
        file_id_of(r, p, c)
        for r, p, c in zip(repo.to_pylist(), path.to_pylist(), commit.to_pylist())
    ]
    return pa.array(out, type=pa.string())


def sha256_u64(s: str) -> int:
    """First 8 digest bytes as big-endian uint64 — numerically identical to
    ``int(sha256_hex(s)[:16], 16)``, so the u64 form and the 16-hex-char form
    of an id interconvert by pure formatting (no lookup table)."""
    d = hashlib.sha256(s.encode("utf-8", errors="surrogatepass")).digest()
    return int.from_bytes(d[:8], "big")


def file_id_u64_of(repo: str, path: str, commit: str) -> int:
    return sha256_u64(f"{repo}|{path}|{commit}")


def u64_to_hex(arr: np.ndarray) -> list[str]:
    """Vectorized uint64 -> 16-hex-char strings (inverse of sha256_u64 on the
    id prefix): one hexlify over the packed big-endian buffer, then slicing."""
    import binascii

    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint64), dtype=">u8")
    h = binascii.hexlify(a.tobytes()).decode()
    return [h[i : i + 16] for i in range(0, 16 * a.size, 16)]


def hex_to_u64(strings) -> np.ndarray:
    """16-hex-char strings -> uint64 ndarray."""
    return np.fromiter((int(s, 16) for s in strings), dtype=np.uint64,
                       count=len(strings))


def hash64_str(s: str) -> int:
    """Deterministic 64-bit hash of a string (two independent crc32 halves)."""
    b = s.encode("utf-8", errors="surrogatepass")
    return (zlib.crc32(b) << 32) | zlib.crc32(b + b"#")


def hash64_np(strings: list[str]) -> np.ndarray:
    """Vectorized-ish 64-bit string hashes -> uint64 ndarray."""
    c = zlib.crc32
    return np.fromiter(
        (
            (c(b) << 32) | c(b + b"#")
            for b in (s.encode("utf-8", errors="surrogatepass") for s in strings)
        ),
        dtype=np.uint64,
        count=len(strings),
    )


def crc32_str(s: str) -> int:
    """Deterministic 32-bit hash of a string (C-speed, unsalted)."""
    return zlib.crc32(s.encode("utf-8", errors="surrogatepass"))


def crc32_np(strings: list[str]) -> np.ndarray:
    """Vectorized-ish crc32 over a list of strings -> uint64 ndarray."""
    c = zlib.crc32
    return np.fromiter(
        (c(s.encode("utf-8", errors="surrogatepass")) for s in strings),
        dtype=np.uint64,
        count=len(strings),
    )


def stable_bucket(s: str, n_buckets: int) -> int:
    """Deterministic partition bucket for a string key (shuffle partitioner)."""
    return crc32_str(s) % n_buckets
