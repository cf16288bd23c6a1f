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


def test_batched_bpe_matches_sequential_when_compatible():
    """VERDICT r3 #4: disjoint same-round merges are individually exact,
    so on a corpus whose top pairs never chain the batched trainer emits
    the identical merge table in one census per k merges."""
    # 2-symbol words: merging never creates new adjacencies at all
    text = " ".join(["ab"] * 9 + ["cd"] * 5 + ["ef"] * 3)
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([text])})
    seq = train_bpe(rd.from_arrow(t), n_merges=3).to_pandas()
    bat = train_bpe(rd.from_arrow(t), n_merges=3,
                    merges_per_round=3).to_pandas()
    assert seq.equals(bat)
    assert list(seq.pair_count) == [9, 5, 3]


def test_batched_bpe_defers_conflicting_pairs():
    """A candidate sharing a symbol with a higher-count accepted pair is
    DEFERRED to the next census, reproducing the sequential chain
    (a,b) -> (ab,c) exactly."""
    text = " ".join(["abc"] * 5)
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([text])})
    seq = train_bpe(rd.from_arrow(t), n_merges=2).to_pandas()
    bat = train_bpe(rd.from_arrow(t), n_merges=2,
                    merges_per_round=4).to_pandas()
    assert seq.equals(bat)
    assert list(seq.token) == ["ab", "abc"]


def test_batched_bpe_segments_equal_sequential():
    """End-to-end: segmenting with a batched-learned table reproduces the
    sequential segmentation on a compatible corpus."""
    docs = ["the cat sat on the mat", "a cat and a rat", "the the the"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(docs)})
    ds = rd.from_arrow(t)
    m_seq = train_bpe(ds, n_merges=6)
    m_bat = train_bpe(ds, n_merges=6, merges_per_round=3)
    # this corpus's rounds are compatible: the learned vocab is identical
    assert (m_seq.to_pandas().token == m_bat.to_pandas().token).all()
    a = bpe_segment_counts(ds, m_seq).to_pandas().sort_values("doc_id")
    b = bpe_segment_counts(ds, m_bat).to_pandas().sort_values("doc_id")
    assert (a.n_words == b.n_words).all()
    assert (a.n_tokens == b.n_tokens).all()
