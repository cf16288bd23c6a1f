"""tfidf_cosine_pairs (ops/tfidf.py) vs a brute-force reference."""

import math
import re

import numpy as np
import pyarrow as pa

import ray.data

from session_graph_ray.functions.hashing import hash64_np


def _brute(texts, ids, df_cap, threshold):
    toksets = []
    for t in texts:
        toks = [w for w in re.split(r"[^\w]+", t.lower()) if w]
        toksets.append(set(int(h) for h in hash64_np(toks))
                       if toks else set())
    n = len(texts)
    df = {}
    for s in toksets:
        for h in s:
            df[h] = df.get(h, 0) + 1
    wq = {h: int(math.floor(
        (math.log((1.0 + float(n)) / (1.0 + float(d))) + 1.0) * 1000000
        + 0.5)) for h, d in df.items()}
    nsq = [sum(wq[h] * wq[h] for h in s) for s in toksets]
    rare = {h for h, d in df.items() if 2 <= d <= df_cap}
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            a, b = (i, j) if ids[i] < ids[j] else (j, i)
            shared = toksets[a] & toksets[b]
            if not (shared & rare):
                continue
            num = sum(wq[h] * wq[h] for h in shared)
            cos = num / math.sqrt(nsq[a]) / math.sqrt(nsq[b])
            if cos >= threshold:
                out.append((ids[a], ids[b],
                            int(math.floor(cos * 1e6 + 0.5))))
    return sorted(out)


def _corpus(seed=21, n=120):
    rng = np.random.RandomState(seed)
    vocab = [f"w{v}" for v in range(400)]
    texts = []
    for _ in range(n):
        k = rng.randint(3, 25)
        texts.append(" ".join(
            vocab[rng.randint(len(vocab))] for _ in range(k)))
    # planted near-duplicates sharing rare tokens
    for i in range(0, n, 10):
        texts.append(texts[i] + " extraword")
    ids = list(range(100, 100 + len(texts)))
    return texts, ids


def test_matches_bruteforce():
    from session_graph_ray.ops.tfidf import tfidf_cosine_pairs

    texts, ids = _corpus()
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(5)
    got = tfidf_cosine_pairs(ds, df_cap=6, threshold=0.25).to_pandas()
    got_t = sorted(zip(got["doc_id_a"], got["doc_id_b"], got["cos_u6"]))
    want = _brute(texts, ids, df_cap=6, threshold=0.25)
    assert got_t == want
    assert len(want) > 0  # the planted near-dups must surface


def test_identical_docs_score_one():
    from session_graph_ray.ops.tfidf import tfidf_cosine_pairs

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["apple pear quince", "apple pear quince",
                          "unrelated text body"], pa.string()),
    }))
    out = tfidf_cosine_pairs(ds, df_cap=5, threshold=0.5).to_pandas()
    assert len(out) == 1
    assert int(out["cos_u6"].iloc[0]) == 1000000
