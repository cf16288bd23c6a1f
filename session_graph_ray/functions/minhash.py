"""Seeded, deterministic MinHash + LSH banding (numpy-vectorized).

This is the genuinely-new distributed piece the reference lacks (its blocking
is "same normalized slug => same node", ``/root/reference/pipeline/common.py:29-36``);
MinHash bands extend that idea to near-duplicate *content*. Parameters follow
the standard S-curve: with ``num_perm = bands * rows_per_band``, a pair with
Jaccard similarity s collides in >=1 band with prob 1-(1-s^r)^b. Defaults
(b=16, r=4) put the 50% threshold at (1/16)^(1/4) ≈ 0.5 — recall-biased for
the planted edit rates (a 5% token edit has shingle Jaccard ≈ 0.74 -> band
collision prob ≈ 0.997), and half the key volume of b=32.

Hash family: Dietzfelbinger multiply-shift, h_i(x) = (a_i * x + b_i) >> 32
with odd random 64-bit a_i — 2-universal for 32-bit outputs under uint64
wraparound arithmetic (the wraparound IS the mod-2^64 the scheme requires,
unlike a Mersenne-mod construction where a 64-bit overflow would silently
break the family's guarantees).

Determinism: permutation parameters derive from a fixed seed; shingle hashing
uses crc32 (unsalted) — identical across workers and runs, unlike Python's
per-process ``hash()``.
"""

from __future__ import annotations

import zlib

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — spreads structured uint64 inputs uniformly."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


class MinHasher:
    """State-heavy object built once per worker process (permutation tables)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        rng = np.random.RandomState(seed)
        # multiply-shift: a odd uint64, b uint64; h(x) = (a*x + b) >> 32
        lo = rng.randint(0, 1 << 32, size=num_perm).astype(np.uint64)
        hi = rng.randint(0, 1 << 32, size=num_perm).astype(np.uint64)
        self.a = ((hi << np.uint64(32)) | lo) | np.uint64(1)
        lo_b = rng.randint(0, 1 << 32, size=num_perm).astype(np.uint64)
        hi_b = rng.randint(0, 1 << 32, size=num_perm).astype(np.uint64)
        self.b = (hi_b << np.uint64(32)) | lo_b
        # per-row fold weights for banding (odd -> bijective multipliers)
        wl = rng.randint(0, 1 << 32, size=self.rows).astype(np.uint64)
        wh = rng.randint(0, 1 << 32, size=self.rows).astype(np.uint64)
        self.band_w = ((wh << np.uint64(32)) | wl) | np.uint64(1)

    # ---- numeric fast path (the pipeline hot path) -----------------------

    def signature_from_vals(self, vals: np.ndarray) -> np.ndarray:
        """MinHash signature (uint64[num_perm], 32-bit values) of a set of
        pre-hashed shingles (uint64 ndarray)."""
        if vals.size == 0:
            return np.full(self.num_perm, 0xFFFFFFFF, dtype=np.uint64)
        vals = np.asarray(vals, dtype=np.uint64)
        hashed = (self.a[:, None] * vals[None, :] + self.b[:, None]) >> np.uint64(32)
        return hashed.min(axis=1)

    def band_keys_u64(self, sig: np.ndarray) -> np.ndarray:
        """One uint64 key per band: weighted fold of the band's rows, mixed
        with the band index so identical values in different bands cannot
        collide across bands."""
        m = sig.reshape(self.bands, self.rows)
        folded = (m * self.band_w[None, :]).sum(axis=1, dtype=np.uint64)
        idx = np.arange(self.bands, dtype=np.uint64)
        return mix64(folded + (idx + np.uint64(1)) * _GOLDEN)

    # ---- flat batch path (one numpy pass for a whole Arrow batch) --------

    def signatures_flat(self, vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """Batch form of ``signature_from_vals``: ``vals`` is the
        concatenation of every row's shingle hashes, ``counts[i]`` how many
        belong to row i. Returns (n_rows, num_perm) uint64 — bit-identical
        to calling ``signature_from_vals`` per row (min is order-invariant;
        empty rows get the same 0xFFFFFFFF sentinel signature).

        Perms are processed in chunks of 8 so the (perm, shingle) temporary
        stays ~64 MB per million shingles instead of 8x that."""
        counts = np.asarray(counts, dtype=np.int64)
        n = counts.size
        sig = np.full((n, self.num_perm), 0xFFFFFFFF, dtype=np.uint64)
        if vals.size == 0 or n == 0:
            return sig
        vals = np.asarray(vals, dtype=np.uint64)
        nz = counts > 0
        seg_starts = (np.cumsum(counts) - counts)[nz]
        for p0 in range(0, self.num_perm, 8):
            p1 = min(p0 + 8, self.num_perm)
            hashed = (
                self.a[p0:p1, None] * vals[None, :] + self.b[p0:p1, None]
            ) >> np.uint64(32)
            sig[nz, p0:p1] = np.minimum.reduceat(hashed, seg_starts, axis=1).T
        return sig

    def band_keys_u64_batch(self, sigs: np.ndarray) -> np.ndarray:
        """Batch form of ``band_keys_u64``: (n_rows, num_perm) -> (n_rows,
        bands), row-major identical to the per-row call."""
        m = sigs.reshape(-1, self.bands, self.rows)
        folded = (m * self.band_w[None, None, :]).sum(axis=2, dtype=np.uint64)
        idx = np.arange(self.bands, dtype=np.uint64)
        return mix64(folded + (idx[None, :] + np.uint64(1)) * _GOLDEN)

    # ---- string-shingle convenience (tests / fixtures / doc dedup) -------

    def signature(self, shingles: list[str]) -> np.ndarray:
        c = zlib.crc32
        vals = np.fromiter(
            (c(s.encode("utf-8", errors="surrogatepass")) for s in set(shingles)),
            dtype=np.uint64,
        )
        return self.signature_from_vals(vals)

    def band_keys(self, sig: np.ndarray) -> list[int]:
        return [int(k) for k in self.band_keys_u64(sig)]


def shingle_vals(token_hashes: np.ndarray, k: int = 3) -> np.ndarray:
    """uint64 hash per k-gram of a token-hash sequence (vectorized rolling
    combine — replaces join-string-then-crc with pure numpy)."""
    h = np.asarray(token_hashes, dtype=np.uint64)
    n = h.size
    if n == 0:
        return h
    if n < k:
        k = n
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):  # k is tiny (3); the inner ops are vectorized
        acc = acc * np.uint64(1000003) + h[j : n - k + 1 + j]
    return mix64(acc)


def _ranges_concat(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate [s, s+c) integer ranges -> one index array (fully
    vectorized). Canonical home of the helper — ``ops.pairing`` imports it
    from here (ops already depends on functions, never the reverse)."""
    if counts.size == 0:
        return np.empty(0, dtype=np.int64)
    total = int(counts.sum())
    off = np.repeat(starts, counts)
    run_start = np.cumsum(counts) - counts
    intra = np.arange(total, dtype=np.int64) - np.repeat(run_start, counts)
    return off + intra


def shingles_flat(
    flat: np.ndarray, sizes: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Batch form of ``shingle_vals``: ``flat`` concatenates every row's
    token hashes, ``sizes[i]`` how many belong to row i. Returns
    (shingle_vals_flat, shingle_counts) — row i's shingles are bit-identical
    to ``shingle_vals(row_hashes_i, k)`` (short rows 0 < n < k fold all n
    tokens into one shingle, exactly like the per-row kernel).

    Windows never cross row boundaries: window start positions are generated
    per row, so one global polynomial pass over ``flat`` computes every
    row's windows at once."""
    flat = np.asarray(flat, dtype=np.uint64)
    sizes = np.asarray(sizes, dtype=np.int64)
    counts = np.where(sizes > 0, np.maximum(sizes - k + 1, 1), 0).astype(np.int64)
    out = np.empty(int(counts.sum()), dtype=np.uint64)
    starts = np.cumsum(sizes) - sizes
    out_starts = np.cumsum(counts) - counts
    P = np.uint64(1000003)
    full = sizes >= k
    if full.any():
        w_pos = _ranges_concat(starts[full], counts[full])
        acc = np.zeros(w_pos.size, dtype=np.uint64)
        for j in range(k):  # k is tiny (3); inner ops are vectorized
            acc = acc * P + flat[w_pos + j]
        out[_ranges_concat(out_starts[full], counts[full])] = mix64(acc)
    short_sizes = np.unique(sizes[(sizes > 0) & (sizes < k)])
    for L in short_sizes:  # <= k-1 distinct classes, each fully vectorized
        rows = np.flatnonzero(sizes == L)
        toks = flat[starts[rows][:, None] + np.arange(L)[None, :]]
        acc = np.zeros(rows.size, dtype=np.uint64)
        for j in range(int(L)):
            acc = acc * P + toks[:, j]
        out[out_starts[rows]] = mix64(acc)
    return out, counts


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token multiset (deterministic, crc-seeded).

    Token hashing is one crc pass + a numpy bit-unpack over the whole token
    list; bit-majority voting yields the fingerprint.
    """
    if not tokens:
        return 0
    c = zlib.crc32
    hs = np.fromiter(
        (
            (c(b) << 32) | c(b + b"#")
            for b in (t.encode("utf-8", errors="surrogatepass") for t in tokens)
        ),
        dtype=np.uint64,
        count=len(tokens),
    )
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1).astype(np.int32)
    acc = (bits * 2 - 1).sum(axis=0)
    fp_bits = (acc > 0).astype(np.uint8)
    return int(np.packbits(fp_bits).view(np.uint64)[0])
