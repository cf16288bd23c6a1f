"""edit_pairs_k (ops/passjoin.py) — PassJoin exact ed<=k join: DP kernel
unit tests, brute-force parity, shift-window edges, short-word route,
counted truncation."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.passjoin import (
    edit_pairs_k,
    lev_batch,
    seg_bounds,
)


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(vocab, k):
    v = sorted(set(vocab))
    out = set()
    for x in range(len(v)):
        for y in range(x + 1, len(v)):
            d = _lev(v[x], v[y])
            if 1 <= d <= k:
                out.add((v[x], v[y], d))
    return out


def _run(vocab, k, **kw):
    ds = rd.from_arrow(pa.table({"token": pa.array(vocab, pa.string())}))
    df = edit_pairs_k(ds, k=k, **kw).to_pandas()
    metric = df["token_a"] == "__truncated__"
    dropped = sum(int(x) for x in df.loc[metric, "token_b"])
    real = df[~metric]
    return set(zip(real["token_a"], real["token_b"],
                   real["dist"].astype(int))), dropped


def test_lev_batch_matches_reference():
    rng = np.random.default_rng(5)
    alpha = list("abcd")
    words = ["".join(rng.choice(alpha, size=rng.integers(0, 9)))
             for _ in range(400)]
    a = np.array(words[:200], dtype=object)
    b = np.array(words[200:], dtype=object)
    got = lev_batch(a, b)
    want = np.array([_lev(x, y) for x, y in zip(a, b)])
    assert (got == want).all()


def test_seg_bounds_partition():
    for k in (1, 2, 3):
        for l in range(k + 1, 30):
            bounds = seg_bounds(l, k)
            assert len(bounds) == k + 1
            assert bounds[0][0] == 0
            assert bounds[-1][0] + bounds[-1][1] == l
            for (s1, n1), (s2, _) in zip(bounds, bounds[1:]):
                assert s1 + n1 == s2
            assert all(n >= 1 for _, n in bounds)


def test_brute_force_parity_randomized():
    rng = np.random.default_rng(77)
    alpha = list("abcde")
    for trial in range(3):
        words = ["".join(rng.choice(alpha, size=rng.integers(1, 10)))
                 for _ in range(200)]
        for k in (1, 2):
            got, dropped = _run(words, k)
            assert dropped == 0
            assert got == _brute(words, k), f"trial={trial} k={k}"


def test_prefix_suffix_indels_cross_segment_shift():
    # dist-2 pairs whose shared segment shifts by the full +-k window
    vocab = ["abcdefgh", "xyabcdefgh", "abcdefghxy", "zzzz"]
    got, _ = _run(vocab, 2)
    assert ("abcdefgh", "xyabcdefgh", 2) in got
    assert ("abcdefgh", "abcdefghxy", 2) in got


def test_short_word_route():
    # words shorter than k+1 chars pair through the dedicated short key
    vocab = ["a", "b", "ab", "abc", "abcd", "xyz"]
    got, dropped = _run(vocab, 2)
    assert dropped == 0
    assert got == _brute(vocab, 2)


def test_unicode_codepoints():
    vocab = ["café", "cafe", "caffé", "unrelated"]
    got, _ = _run(vocab, 2)
    assert got == _brute(vocab, 2)


def test_cap_counts_dropped_products():
    # one hot key group: many words sharing a segment; tiny cap
    vocab = [f"aaa{c}" for c in "bcdefghijklm"]
    got_uncapped, d0 = _run(vocab, 1)
    assert d0 == 0
    got_capped, d1 = _run(vocab, 1, group_cap=2)
    assert d1 > 0
    assert got_capped <= got_uncapped
