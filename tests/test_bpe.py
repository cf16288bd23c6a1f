"""BPE merge learning (ops/bpe.py) vs a pure-Python reference trainer with
the identical (count desc, pair asc) tie-break and greedy left-to-right
merge application."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.bpe import bpe_segment_counts, train_bpe

_NEW_BASE = 0x110000


def _brute_bpe(texts, n_merges):
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            words[tuple(ord(c) for c in w)] += 1
    merges = []
    for r in range(n_merges):
        pc_ = Counter()
        for w, n in words.items():
            for i in range(len(w) - 1):
                pc_[(w[i], w[i + 1])] += n
        if not pc_:
            break
        (a, b), c = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        z = _NEW_BASE + r
        merges.append((r, a, b, z, c))
        new_words = Counter()
        for w, n in words.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    out.append(z)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] += n
        words = new_words
    return merges, words


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "aaaa aaa aa aaaa",          # run-overlap regime (a,a) merges
    "low new wide lowest newest",
    "",
]


def test_train_bpe_matches_reference_trainer():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS),
    })).repartition(3)
    got = train_bpe(ds, n_merges=12).to_pandas()
    want, _ = _brute_bpe(TEXTS, 12)
    assert len(got) == len(want)
    for row, (r, a, b, z, c) in zip(got.itertuples(index=False), want):
        assert (row.round, row.left, row.right, row.new_id,
                row.pair_count) == (r, a, b, z, c)


def test_train_bpe_partition_independent():
    t = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS)})
    a = train_bpe(rd.from_arrow(t).repartition(1), n_merges=8).to_pandas()
    b = train_bpe(rd.from_arrow(t).repartition(5), n_merges=8).to_pandas()
    assert a.equals(b)


def test_segment_counts_match_reference_segmentation():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS),
    })).repartition(2)
    merges_tbl = train_bpe(ds, n_merges=12)
    got = (bpe_segment_counts(ds, merges_tbl)
           .to_pandas().set_index("doc_id").sort_index())
    merges, _ = _brute_bpe(TEXTS, 12)

    def seg_len(word):
        w = tuple(ord(c) for c in word)
        for _, a, b, z, _c in merges:
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    out.append(z)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            w = tuple(out)
        return len(w)

    for did, text in enumerate(TEXTS):
        words = text.split()
        assert int(got.loc[did, "n_words"]) == len(words)
        assert int(got.loc[did, "n_tokens"]) == sum(
            seg_len(w) for w in words), (did, text)
    # merges genuinely compress: fewer tokens than characters
    chars = sum(len(w) for t in TEXTS for w in t.split())
    assert got.n_tokens.sum() < chars
