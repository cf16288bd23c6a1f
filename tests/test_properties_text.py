"""Property-based tests (hypothesis) for the round-2 text-operator kernels:
tokenization, duplicate-span gram explosion, repetition counting, and PII
redaction. Each pins the vectorized batch kernel against a trivially-correct
pure-Python reference on random inputs — kernels are called directly on
Arrow tables, no Ray session needed."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

# a small alphabet makes token collisions and duplicate grams likely
_tok = st.text(alphabet="abc", min_size=1, max_size=3)
_doc = st.lists(_tok, min_size=0, max_size=30).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=12)


def _table(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


@settings(max_examples=60, deadline=None)
@given(_docs)
def test_flat_tokens_matches_python_split(texts):
    from session_graph_ray.ops.wordcount import _flat_tokens

    flat, lengths = _flat_tokens(_table(texts)["text"])
    toks = flat.to_pylist()
    k = 0
    for i, t in enumerate(texts):
        ref = t.split()
        assert lengths[i] == len(ref)
        assert toks[k : k + len(ref)] == ref
        k += len(ref)
    assert k == len(toks)


@settings(max_examples=40, deadline=None)
@given(_docs, st.integers(min_value=2, max_value=5))
def test_gram_explosion_matches_bruteforce(texts, n):
    from session_graph_ray.ops.spandedup import _explode_grams

    out = _explode_grams(n, "doc_id", "text")(_table(texts))
    hashes = out["gram_h"].to_pylist()
    rows = out["g_doc_id"].to_pylist()
    # window counts per doc match, rows appear in doc order, and equal gram
    # strings always map to equal hashes (the dup-decision soundness side)
    gram_of = {}
    k = 0
    for i, t in enumerate(texts):
        toks = t.split()
        for j in range(max(len(toks) - n + 1, 0)):
            gram = " ".join(toks[j : j + n])
            assert rows[k] == i
            if gram in gram_of:
                assert gram_of[gram] == hashes[k], "equal grams, equal hash"
            gram_of[gram] = hashes[k]
            k += 1
    assert k == len(hashes)
    # distinct grams map to distinct hashes on these tiny universes
    by_hash = {}
    for g, h in gram_of.items():
        assert by_hash.setdefault(h, g) == g, "hash collision at toy scale"


@settings(max_examples=40, deadline=None)
@given(_docs, st.integers(min_value=2, max_value=4))
def test_top_ngram_count_matches_counter(texts, n):
    from session_graph_ray.ops.spandedup import _explode_grams

    out = _explode_grams(n, "doc_id", "text")(_table(texts))
    hashes = np.asarray(out["gram_h"].to_pylist(), dtype=np.int64)
    rows = np.asarray(out["g_doc_id"].to_pylist(), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split()
        grams = [" ".join(toks[j : j + n])
                 for j in range(max(len(toks) - n + 1, 0))]
        expect = max(Counter(grams).values()) if grams else 0
        sel = hashes[rows == i]
        mine = int(np.max(np.unique(sel, return_counts=True)[1])) if len(sel) else 0
        assert mine == expect


_pii_frag = st.sampled_from(
    ["plain words here", "a@b.co", "1.2.3.4", "+1 555 123 4567",
     "123-45-6789", "not an ip 1.2", "x@y", "10.0.0.255 end",
     "u1@ex3.org trailing", "ssn-ish 12-34-5678"]
)
_pii_doc = st.lists(_pii_frag, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(_pii_doc, min_size=1, max_size=8))
def test_pii_kernels_equal_chained_re_sub(texts):
    """Arrow RE2 count+replace chain == Python re chain on the default
    patterns (the same equivalence the DuckDB oracle relies on)."""
    from session_graph_ray.ops.pii import DEFAULT_PATTERNS

    cur_col = _table(texts)["text"]
    counts = {}
    for name, pat in DEFAULT_PATTERNS.items():
        counts[name] = pc.count_substring_regex(cur_col, pat).to_pylist()
        cur_col = pc.replace_substring_regex(cur_col, pat, f"[{name.upper()}]")
    red = cur_col.to_pylist()
    for i, s in enumerate(texts):
        cur = s
        for name, pat in DEFAULT_PATTERNS.items():
            assert counts[name][i] == len(re.findall(pat, cur))
            cur = re.sub(pat, f"[{name.upper()}]", cur)
        assert red[i] == cur
