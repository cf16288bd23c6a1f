"""Seeded, deterministic MinHash + LSH banding (numpy-vectorized).

This is the genuinely-new distributed piece the reference lacks (its blocking
is "same normalized slug => same node", ``/root/reference/pipeline/common.py:29-36``);
MinHash bands extend that idea to near-duplicate *content*. Parameters follow
the standard S-curve: with ``num_perm = bands * rows_per_band``, a pair with
Jaccard similarity s collides in >=1 band with prob 1-(1-s^r)^b. Defaults
(b=16, r=4) put the 50% threshold at (1/16)^(1/4) ≈ 0.5 — recall-biased for
the planted edit rates (a 5% token edit has shingle Jaccard ≈ 0.74 -> band
collision prob ≈ 0.997), and half the key volume of b=32.

Determinism: permutation parameters derive from a fixed seed; shingle hashing
uses crc32 (unsalted) — identical across workers and runs, unlike Python's
per-process ``hash()``.
"""

from __future__ import annotations

import zlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXH = np.uint64((1 << 32) - 1)


class MinHasher:
    """State-heavy object built once per actor (permutation tables)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        rng = np.random.RandomState(seed)
        # universal hashing h_i(x) = ((a_i * x + b_i) mod p) mod 2^32
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)

    def signature(self, shingles: list[str]) -> np.ndarray:
        """MinHash signature (uint32[num_perm]) of a shingle set."""
        if not shingles:
            return np.full(self.num_perm, 0xFFFFFFFF, dtype=np.uint64)
        c = zlib.crc32
        vals = np.fromiter(
            (c(s.encode("utf-8", errors="surrogatepass")) for s in set(shingles)),
            dtype=np.uint64,
        )
        # (num_perm, n_shingles) — fine for capped shingle counts
        hashed = (self.a[:, None] * vals[None, :] + self.b[:, None]) % _MERSENNE
        hashed &= _MAXH
        return hashed.min(axis=1)

    def band_keys(self, sig: np.ndarray) -> list[str]:
        """One stable string key per band: 'band_idx:crc32(band bytes)'."""
        out = []
        for i in range(self.bands):
            band = sig[i * self.rows : (i + 1) * self.rows].astype(np.uint32)
            h = zlib.crc32(band.tobytes())
            out.append(f"{i}:{h:08x}")
        return out


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token multiset (deterministic, crc-seeded).

    Each token contributes a 64-bit signature built from two crc32 halves;
    bit-majority voting yields the fingerprint.
    """
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        b = t.encode("utf-8", errors="surrogatepass")
        h = (zlib.crc32(b) << 32) | zlib.crc32(b + b"#")
        bits = np.unpackbits(
            np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    fp_bits = (acc > 0).astype(np.uint8)
    return int(np.packbits(fp_bits).view(">u8")[0])
