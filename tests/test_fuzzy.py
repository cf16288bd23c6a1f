"""edit1_pairs / edit1_mask (ops/fuzzy.py) vs brute-force edit distance."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.fuzzy import edit1_mask, edit1_pairs


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


def test_edit1_mask_cases():
    a = np.array(["cat", "cat", "cat", "cat", "cat", "abc", "", "a"],
                 dtype=object)
    b = np.array(["cut", "cats", "at", "cat", "dog", "acbc", "a", ""],
                 dtype=object)
    got = edit1_mask(a, b)
    want = np.array([_lev(x, y) == 1 for x, y in zip(a, b)])
    assert (got == want).all(), list(zip(a, b, got, want))


def test_edit1_mask_randomized():
    rng = np.random.default_rng(17)
    alpha = list("abcd")
    words = ["".join(rng.choice(alpha, size=rng.integers(1, 7)))
             for _ in range(300)]
    a = np.array(words[:150], dtype=object)
    b = np.array(words[150:], dtype=object)
    got = edit1_mask(a, b)
    want = np.array([_lev(x, y) == 1 for x, y in zip(a, b)])
    assert (got == want).all()


def test_edit1_pairs_matches_brute_force():
    rng = np.random.default_rng(23)
    alpha = list("abcde")
    vocab = sorted({"".join(rng.choice(alpha, size=rng.integers(2, 6)))
                    for _ in range(120)})
    ds = rd.from_arrow(pa.table({
        "token": pa.array(vocab * 2, pa.string()),  # duplicates on purpose
    })).repartition(4)
    got = {(r.token_a, r.token_b)
           for r in edit1_pairs(ds).to_pandas().itertuples(index=False)
           if r.token_a != "__truncated__"}
    want = {(x, y) for i, x in enumerate(vocab) for y in vocab[i + 1:]
            if _lev(x, y) == 1}
    assert got == want and len(want) > 30


def test_edit1_truncation_counts_sum_when_equal():
    """ADVICE r3: two variant buckets dropping EQUAL pair counts must both
    survive the pair-dedup (summed), never collapse to one metric row."""
    import string

    # 26 letters + 4 digits = 30 tokens per variant family
    toks = ([c + "aaa" for c in (string.ascii_lowercase + "0123")]
            + [c + "bbb" for c in (string.ascii_lowercase + "0123")])
    ds = rd.from_arrow(pa.table({"token": pa.array(toks, pa.string())}))
    out = edit1_pairs(ds, bucket_cap=4).to_pandas()
    metrics = out[out.token_a == "__truncated__"]
    dropped = int(metrics.token_b.astype(int).sum())
    # the 'aaa' and 'bbb' variant groups each hold 30 tokens; cap 4 drops
    # C(30,2)-C(4,2)=429 per group (other variant groups are singletons)
    assert dropped == 2 * (30 * 29 // 2 - 4 * 3 // 2)
