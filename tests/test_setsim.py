"""setsim_join (ops/setsim.py) — exact AllPairs prefix-filter join: brute
-force parity, broadcast-vs-join-path parity, counted cap truncation,
prefix-theorem edge cases."""

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from session_graph_ray.ops.setsim import (
    setsim_join,
    split_setsim_metric_rows,
)


def _pair_schema():
    from session_graph_ray.ops.setsim import _PAIR_SCHEMA

    return _PAIR_SCHEMA


_M = 1_000_000


def _tok(s):
    return {t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t}


def _brute(texts, tau):
    """All (i, j, jacc_u) with integer-exact threshold — the oracle."""
    tau_u = int(round(tau * _M))
    sets = {i: _tok(t) for i, t in texts.items()}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            i = len(sa & sb)
            u = len(sa) + len(sb) - i
            if u > 0 and _M * i >= tau_u * u:
                out.add((a, b, (2 * _M * i + u) // (2 * u)))
    return out


def _run(texts, tau, **kw):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    }))
    res = setsim_join(ds, tau, **kw)
    tbls = [t for t in (ray.get(r) for r in res.to_arrow_refs())
            if t.num_rows]  # Ray emits schema-less sentinel empty blocks
    tbl = (pa.concat_tables(tbls) if tbls
           else _pair_schema().empty_table())
    real, dropped = split_setsim_metric_rows(tbl)
    pairs = set(zip(
        real.column("doc_a").to_pylist(),
        real.column("doc_b").to_pylist(),
        real.column("jacc_u").to_pylist(),
    ))
    return pairs, dropped


def test_brute_force_parity():
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    base = rng.choice(vocab, size=12, replace=False)
    for i in range(60):
        if i % 3 == 0:
            # mutated copies of a template -> plenty of true pairs
            words = list(base)
            for _ in range(rng.integers(0, 4)):
                words[rng.integers(len(words))] = vocab[rng.integers(40)]
        else:
            words = list(rng.choice(vocab, size=rng.integers(3, 15)))
        texts[i] = " ".join(words)
    for tau in (0.5, 0.7, 0.9):
        got, dropped = _run(texts, tau)
        assert dropped == 0
        assert got == _brute(texts, tau), f"tau={tau}"


def test_join_path_parity():
    texts = {i: f"alpha beta gamma_{i % 5} delta w{i % 7}" for i in range(40)}
    a, da = _run(texts, 0.6)
    b, db = _run(texts, 0.6, df_broadcast_max=0)
    assert a == b and da == db == 0
    assert a == _brute(texts, 0.6)


def test_exact_duplicates_score_one_million():
    texts = {1: "the quick brown fox", 2: "the quick brown fox",
             3: "quick brown the fox", 4: "something else entirely"}
    got, _ = _run(texts, 0.99)
    assert got == {(1, 2, _M), (1, 3, _M), (2, 3, _M)}


def test_unique_and_empty_docs_no_pairs():
    # every token df=1, plus empty/whitespace docs: no pairs, no crash
    texts = {1: "aaa bbb ccc", 2: "ddd eee fff", 3: "", 4: "   ", 5: "ggg"}
    got, dropped = _run(texts, 0.5)
    assert got == set() and dropped == 0


def test_identical_docs_collapse_no_truncation():
    # 30 identical docs are ONE profile: the kernel is quadratic in
    # profiles, so even group_cap=2 must not truncate — all C(30,2)
    # within-profile pairs survive at jacc 1.0
    texts = {i: "shared tokens every doc has" for i in range(30)}
    got, dropped = _run(texts, 0.8, group_cap=2)
    assert dropped == 0
    assert len(got) == 435
    assert all(j == _M for _, _, j in got)


def test_group_cap_counts_dropped_member_pairs():
    # two DISTINCT profiles share one prefix token (the min-hash of the
    # common df-4 tokens): P1 = docs 1,2 ("x y z"), P2 = docs 3,4
    # ("x y w q"). group_cap=1 keeps only the first (smaller-n) profile
    # in that run, dropping C(4,2)-C(2,2) = 5 member pairs — counted.
    # Within-profile pairs (discovered in every run each profile owns)
    # still survive.
    texts = {1: "x y z", 2: "x y z", 3: "x y w q", 4: "x y w q"}
    got, dropped = _run(texts, 0.5, group_cap=1)
    assert got == {(1, 2, _M), (3, 4, _M)}
    assert dropped == 5


def test_length_filter_blocks_size_mismatch():
    # subset containment: small doc's tokens all inside the big doc, but
    # size ratio < tau -> jaccard 3/10 < 0.5, must not pair
    texts = {1: "a b c", 2: "a b c d e f g h i j"}
    got, _ = _run(texts, 0.5)
    assert got == set()


def test_incremental_equals_batch_restriction():
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(30)]
    base = rng.choice(vocab, size=10, replace=False)
    texts = {}
    for i in range(50):
        if i % 2 == 0:
            words = list(base)
            for _ in range(rng.integers(0, 3)):
                words[rng.integers(len(words))] = vocab[rng.integers(30)]
        else:
            words = list(rng.choice(vocab, size=rng.integers(3, 12)))
        texts[i] = " ".join(words)
    split = 40  # docs 40..49 are the delta
    batch, _ = _run(texts, 0.6)
    want = {(a, b, j) for a, b, j in batch if a >= split or b >= split}
    got, dropped = _run(texts, 0.6, new_min_doc_id=split)
    assert dropped == 0
    assert got == want
    assert len(want) < len(batch)  # restriction is real


def test_incremental_empty_delta():
    texts = {i: "alpha beta gamma" for i in range(10)}
    got, dropped = _run(texts, 0.6, new_min_doc_id=100)
    assert got == set() and dropped == 0


def test_tiling_parity():
    # force tiling on (tiny tile_target): replicated chunk-pair tiles
    # must produce the identical pair set
    texts = {}
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(20)]
    base = list(rng.choice(vocab, size=8, replace=False))
    for i in range(60):
        words = list(base)
        for _ in range(rng.integers(0, 3)):
            words[rng.integers(len(words))] = vocab[rng.integers(20)]
        texts[i] = " ".join(words)
    a, da = _run(texts, 0.6)
    b, db = _run(texts, 0.6, tile_target=4, tile_max=4)
    assert a == b and da == db == 0
