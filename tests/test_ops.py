"""Operator-library tests: dedup family, similarity, text stats, sessionize,
multimodal plumbing, joins."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_exact_dedup_survivors():
    from session_graph_ray.ops.dedup import exact_dedup_survivors

    ds = rd.from_items(
        [
            {"doc_id": 3, "text": "aaa"},
            {"doc_id": 1, "text": "aaa"},
            {"doc_id": 2, "text": "bbb"},
            {"doc_id": 9, "text": "aaa"},
        ]
    )
    out = sorted(r["doc_id"] for r in exact_dedup_survivors(ds).iter_rows())
    assert out == [1, 2]


def test_minhash_near_dedup_docs():
    from session_graph_ray.ops.dedup import near_dedup_assignments

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest near the old stone bridge today"
    )
    edited = base.replace("stone", "wooden")
    other = "completely different content about databases indexes and query planners in modern distributed systems for analytics"
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": edited},
            {"doc_id": 3, "text": other},
        ]
    )
    out = near_dedup_assignments(ds, threshold=0.5).to_pandas()
    m = dict(zip(out["doc_id"], out["canonical_doc_id"]))
    assert m[1] == m[2] == 1
    assert m[3] == 3


def test_simhash_deterministic():
    from session_graph_ray.ops.dedup import simhash_fingerprints

    docs = rd.read_parquet(f"{SF}/documents.parquet").limit(20)
    a = simhash_fingerprints(docs).to_pandas().sort_values("doc_id")
    b = simhash_fingerprints(docs).to_pandas().sort_values("doc_id")
    assert (a["simhash"].values == b["simhash"].values).all()
    assert a["simhash"].str.len().eq(16).all()


def test_embedding_near_dup_finds_planted_copy():
    from session_graph_ray.ops.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(0)
    vecs = rng.randn(50, 16)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    rows.append({"vec_id": 999, "embedding": vecs[7].tolist()})  # exact copy
    out = embedding_near_dup_pairs(rd.from_items(rows), threshold=0.99).to_pandas()
    assert {(7, 999)} == set(zip(out["id_a"], out["id_b"]))


def test_knn_bruteforce_matches_numpy():
    from session_graph_ray.ops.similarity import brute_force_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    rows = sorted(emb.take(3), key=lambda r: r["vec_id"])
    q = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    out = brute_force_topk(emb, q, [r["vec_id"] for r in rows], k=5).to_pandas()
    assert len(out) == 15
    # cross-check query 0 against a local numpy scan
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(t["vec_id"].to_pylist())
    mu = m / np.linalg.norm(m, axis=1, keepdims=True)
    q0 = q[0] / np.linalg.norm(q[0])
    sims = mu @ q0
    order = np.lexsort((ids, -sims))
    expect = [int(ids[i]) for i in order if int(ids[i]) != rows[0]["vec_id"]][:5]
    got = out[out["query_id"] == rows[0]["vec_id"]].sort_values("rank")["vec_id"].tolist()
    assert got == expect


def test_ivf_topk_high_recall():
    from session_graph_ray.ops.similarity import brute_force_topk, ivf_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    rows = sorted(emb.take(2), key=lambda r: r["vec_id"])
    q = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    qids = [r["vec_id"] for r in rows]
    exact = brute_force_topk(emb, q, qids, k=10).to_pandas()
    approx = ivf_topk(emb, q, qids, k=10, n_centroids=8, n_probe=4).to_pandas()
    inter = len(
        set(zip(exact["query_id"], exact["vec_id"]))
        & set(zip(approx["query_id"], approx["vec_id"]))
    )
    assert inter / len(exact) >= 0.5  # recall of the probed subset


def test_text_stats_token_contract():
    from session_graph_ray.ops.textstats import text_stats

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "  hello   world \n\t x "},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "a,b;c!"},
        ]
    )
    out = text_stats(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 3  # == len(s.split())
    assert out.loc[2, "n_tokens"] == 0
    assert out.loc[3, "n_punct"] == 3


def test_quality_and_langid():
    from session_graph_ray.ops.textstats import quality_scores

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "the cat and the dog sat on the mat in the sun and it was warm"},
            {"doc_id": 2, "text": "le chat est dans la maison et il est content de la vie en France"},
            {"doc_id": 3, "text": "x"},
        ]
    )
    out = quality_scores(ds, concurrency=2).to_pandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "fr"
    assert out.loc[1, "quality"] > out.loc[3, "quality"]
    # micro-unit twins are exact quantizations of the float columns
    # (the doc_quality oracle contract, __ray_entry__.py)
    import numpy as np

    assert (out["stop_micro"]
            == np.floor(out["stopword_ratio"] * 1e6 + 0.5)).all()
    assert (np.abs(out["quality_micro"] - out["quality"] * 1e6) <= 1).all()


def test_rolling_fingerprint_shift_invariance():
    from session_graph_ray.ops.textstats import rolling_fingerprint

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": text},
            {"doc_id": 2, "text": "PREFIX " + text},  # min-window survives shift
            {"doc_id": 3, "text": "unrelated words entirely here now and forever"},
        ]
    )
    out = rolling_fingerprint(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "fingerprint"] == out.loc[2, "fingerprint"]
    assert out.loc[1, "fingerprint"] != out.loc[3, "fingerprint"]


def test_sessionize_counts():
    from session_graph_ray.ops.sessionize import sessionize_counts

    t0 = np.datetime64("2024-01-01T00:00:00")
    mins = np.timedelta64(1, "m")
    rows = [
        {"user_id": 1, "ts": t0},
        {"user_id": 1, "ts": t0 + 10 * mins},
        {"user_id": 1, "ts": t0 + 120 * mins},  # gap > 30min -> new session
        {"user_id": 2, "ts": t0},
    ]
    out = sessionize_counts(rd.from_items(rows)).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2 and out.loc[1, "n_events"] == 3
    assert out.loc[2, "n_sessions"] == 1


def test_media_feature_plumbing():
    from session_graph_ray.ops.multimodal import (
        extract_media_features,
        synthesize_media_table,
    )

    tbl = synthesize_media_table(n=32)
    media = rd.from_arrow(tbl)
    out = extract_media_features(media, concurrency=2).to_pandas()
    out = out.merge(
        tbl.select(["media_id", "kind"]).to_pandas(), on="media_id"
    ).set_index("media_id")
    assert len(out) == 32
    assert out["decode_error"].isna().all()  # every REAL format decodes
    assert out["feature"].map(len).eq(32).all()
    # image + video decode real dimensions; audio has none
    assert (out.loc[out["kind"] != "audio", "width"] > 0).all()
    # audio features carry the sample rate in slot 0
    audio_feats = out.loc[out["kind"] == "audio", "feature"]
    assert all(f[0] == 16000 for f in audio_feats)
    # video: slot 22 = total frames, slot 23 = sampled frames (stride 2)
    vid_feats = out.loc[out["kind"] == "video", "feature"]
    assert all(f[22] >= f[23] >= 1 for f in vid_feats)

    # quarantine path: garbage payloads must not fail the task
    bad = pa.table(
        {
            "media_id": pa.array(["bad1", "bad2"], pa.string()),
            "kind": pa.array(["image", "video"], pa.string()),
            "payload": pa.array([b"x", b"nope"], pa.large_binary()),
            "meta": pa.array(["{}", "{}"], pa.string()),
        }
    )
    out2 = extract_media_features(rd.from_arrow(bad), concurrency=2).to_pandas()
    assert out2["decode_error"].notna().all()


def test_broadcast_and_hash_join_agree():
    from session_graph_ray.ops.join import broadcast_join, hash_join

    left = rd.from_items([{"k": i % 7, "v": i} for i in range(100)])
    right_df = pd.DataFrame({"k2": list(range(7)), "name": [f"n{i}" for i in range(7)]})
    b = broadcast_join(left, right_df, left_on="k", right_on="k2").to_pandas()
    h = hash_join(left, rd.from_pandas(right_df), on="k", right_on="k2").to_pandas()
    assert len(b) == len(h) == 100
    assert sorted(zip(b["v"], b["name"])) == sorted(zip(h["v"], h["name"]))


def test_wordcount_token_frequencies():
    from session_graph_ray.ops.wordcount import token_frequencies, top_k_tokens

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "a b a  c"},      # double space -> empty split
            {"doc_id": 2, "text": " a b "},         # leading/trailing space
            {"doc_id": 3, "text": "c a"},
        ]
    )
    freq = {r["token"]: r["n"] for r in token_frequencies(ds).iter_rows()}
    assert freq == {"a": 4, "b": 2, "c": 2}
    top = [r["token"] for r in top_k_tokens(ds, k=2).iter_rows()]
    assert top == ["a", "b"]  # count desc, token asc tie-break


def test_vocab_stats_distinct_and_ttr():
    from session_graph_ray.ops.wordcount import vocab_stats

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "x y x z"},   # 4 tokens, 3 distinct
            {"doc_id": 2, "text": "w w w"},     # 3 tokens, 1 distinct
            {"doc_id": 3, "text": ""},          # empty -> dropped (SQL parity)
        ]
    )
    rows = {r["doc_id"]: r for r in vocab_stats(ds).iter_rows()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_distinct"] == 3
    assert rows[1]["ttr_permille"] == 750
    assert rows[2]["n_tokens"] == 3 and rows[2]["n_distinct"] == 1
    assert rows[2]["ttr_permille"] == 333


def test_pii_scrub_counts_and_masking_order():
    from session_graph_ray.ops.pii import pii_scrub

    ds = rd.from_items(
        [
            # email digits must NOT double-count as phone/ssn after redaction
            {"doc_id": 1, "text": "write bob@mail123.example.com or +1 555 123 4567"},
            {"doc_id": 2, "text": "host 192.168.0.1 ssn 123-45-6789"},
            {"doc_id": 3, "text": "clean text, no pii at all"},
        ]
    )
    rows = {r["doc_id"]: r for r in pii_scrub(ds).iter_rows()}
    r1 = rows[1]
    assert r1["n_email"] == 1 and r1["n_phone"] == 1 and r1["n_ssn"] == 0
    assert r1["text_redacted"] == "write [EMAIL] or [PHONE]"
    r2 = rows[2]
    assert r2["n_ipv4"] == 1 and r2["n_ssn"] == 1
    assert r2["text_redacted"] == "host [IPV4] ssn [SSN]"
    r3 = rows[3]
    assert r3["text_redacted"] == r3["text"]
    assert r3["n_email"] + r3["n_ipv4"] + r3["n_phone"] + r3["n_ssn"] == 0


def test_pii_filter_drops_matching_rows():
    from session_graph_ray.ops.pii import pii_filter

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "mail me: a@b.co"},
            {"doc_id": 2, "text": "all clear"},
        ]
    )
    assert [r["doc_id"] for r in pii_filter(ds).iter_rows()] == [2]


def test_semantic_dedup_planted_copies():
    from session_graph_ray.ops.semdedup import (
        semantic_dedup_assignments,
        semantic_dedup_survivors,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(60, 16)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(60)]
    # plant near-copies of vectors 0..4 (tiny perturbation -> cosine ~ 1)
    for i in range(5):
        v = base[i] + 0.001 * rng.randn(16)
        rows.append({"vec_id": 1000 + i, "embedding": v.tolist()})
    ds = rd.from_items(rows)
    asg = semantic_dedup_assignments(ds, threshold=0.95, n_clusters=4).to_pandas()
    assert len(asg) == 65
    dropped = asg[asg.vec_id != asg.rep_id]
    assert sorted(dropped.vec_id.tolist()) == [1000, 1001, 1002, 1003, 1004]
    assert sorted(dropped.rep_id.tolist()) == [0, 1, 2, 3, 4]
    surv = semantic_dedup_survivors(ds, threshold=0.95, n_clusters=4).to_pandas()
    assert sorted(surv.vec_id.tolist()) == list(range(60))


def test_semantic_dedup_transitive_within_cluster():
    from session_graph_ray.ops.semdedup import semantic_dedup_assignments

    rng = np.random.RandomState(3)
    a = rng.randn(16)
    rows = [{"vec_id": i, "embedding": (a + 0.0005 * rng.randn(16)).tolist()}
            for i in range(6)]  # one 6-member dup group
    rows += [{"vec_id": 100 + i, "embedding": rng.randn(16).tolist()}
             for i in range(20)]
    ds = rd.from_items(rows)
    asg = semantic_dedup_assignments(ds, threshold=0.95, n_clusters=2).to_pandas()
    group = asg[asg.vec_id < 100]
    assert (group.rep_id == 0).all()  # whole group collapses to min id


def test_duplicate_span_stats_planted():
    from session_graph_ray.ops.spandedup import duplicate_span_stats

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
    docs = [
        {"doc_id": 1, "text": "unique one two three " + span},        # 24 tokens? no: 4+10
        {"doc_id": 2, "text": span + " tail words here now extra"},
        {"doc_id": 3, "text": "totally different content with no shared spans at all beyond"},
        {"doc_id": 4, "text": "short doc"},                            # < n tokens
    ]
    ds = rd.from_items(docs)
    out = {r["doc_id"]: r for r in duplicate_span_stats(ds, n=8).iter_rows()}
    # the 10-token shared span has 3 duplicated 8-grams in each carrier
    assert out[1]["n_grams"] == 14 - 7 and out[1]["n_dup_grams"] == 3
    assert out[2]["n_grams"] == 15 - 7 and out[2]["n_dup_grams"] == 3
    assert out[3]["n_dup_grams"] == 0
    assert out[4]["n_grams"] == 0 and out[4]["n_dup_grams"] == 0
    assert out[4]["dup_frac_permille"] == 0


def test_duplicate_span_within_doc_repeat():
    from session_graph_ray.ops.spandedup import duplicate_span_stats

    rep = "one two three four five six seven eight"  # exactly 8 tokens
    ds = rd.from_items([
        {"doc_id": 1, "text": rep + " filler " + rep},  # same 8-gram twice
        {"doc_id": 2, "text": "nothing in common with that other document here"},
    ])
    out = {r["doc_id"]: r for r in duplicate_span_stats(ds, n=8).iter_rows()}
    assert out[1]["n_dup_grams"] >= 2  # both copies of the repeated gram flagged
    assert out[2]["n_dup_grams"] == 0


def test_repetition_stats_top_2gram():
    from session_graph_ray.ops.wordcount import repetition_stats

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "ha ho ha ho ha ho end"},  # "ha ho" x3 in 7 tokens
            {"doc_id": 2, "text": "all words unique here now"},
            {"doc_id": 3, "text": "solo"},                    # < 2 tokens
        ]
    )
    out = {r["doc_id"]: r for r in repetition_stats(ds, n=2).iter_rows()}
    assert out[1]["max_2gram_count"] == 3
    assert out[1]["top2_cover_permille"] == (1000 * 2 * 3) // 7
    assert out[2]["max_2gram_count"] == 1
    assert out[3]["max_2gram_count"] == 0 and out[3]["top2_cover_permille"] == 0


def test_contamination_stats_planted_leak():
    from session_graph_ray.ops.spandedup import contamination_stats

    span = "q w e r t y u i o p"  # 10 tokens -> 3 shared 8-grams
    train = rd.from_items([
        {"doc_id": 1, "text": "training corpus body " + span},
        {"doc_id": 2, "text": "other training material entirely distinct from anything else"},
    ])
    test = rd.from_items([
        {"doc_id": 10, "text": span + " plus novel continuation words"},   # leaked
        {"doc_id": 11, "text": "fresh benchmark question with no overlap at all whatsoever"},
        {"doc_id": 12, "text": "tiny"},
    ])
    out = {r["doc_id"]: r for r in contamination_stats(train, test, n=8).iter_rows()}
    assert out[10]["n_hit_grams"] == 3 and out[10]["n_grams"] == 14 - 7
    assert out[10]["hit_frac_permille"] == (1000 * 3) // 7
    assert out[11]["n_hit_grams"] == 0
    assert out[12]["n_grams"] == 0 and out[12]["hit_frac_permille"] == 0


def test_pack_sequences_invariants():
    from session_graph_ray.ops.packing import pack_sequences, packing_stats

    rng = np.random.RandomState(11)
    docs = [{"doc_id": i, "text": " ".join(["tok"] * int(rng.randint(5, 200)))}
            for i in range(300)]
    docs.append({"doc_id": 999, "text": " ".join(["big"] * 700)})  # oversize
    ds = rd.from_items(docs)
    out = pack_sequences(ds, max_tokens=512, n_shards=8).to_pandas()
    assert len(out) == 301 and out.doc_id.is_unique  # every doc exactly once
    # no bin exceeds the budget except dedicated oversize bins
    fills = out.groupby("pack_id").n_tokens.sum()
    over_bins = set(out[out.oversize].pack_id)
    assert all(v <= 512 for b, v in fills.items() if b not in over_bins)
    assert out[out.doc_id == 999].oversize.all()
    # oversize bins hold exactly one doc
    assert (out[out.pack_id.isin(over_bins)].groupby("pack_id").size() == 1).all()
    # determinism across runs
    out2 = pack_sequences(ds, max_tokens=512, n_shards=8).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )
    stats = packing_stats(
        pack_sequences(ds, max_tokens=512, n_shards=8), 512
    ).to_pandas()
    assert stats.n_docs.sum() == 301
    # FFD should keep average fill of non-oversize bins reasonably high
    normal = stats[~stats.pack_id.isin(over_bins)]
    assert normal.fill_permille.mean() > 600


def test_keyword_topk_integer_ranking():
    from session_graph_ray.ops.search import keyword_topk

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "apple banana apple cherry"},
            {"doc_id": 2, "text": "apple apple apple"},
            {"doc_id": 3, "text": "banana cherry banana"},
            {"doc_id": 4, "text": "nothing relevant here"},
        ]
    )
    out = keyword_topk(ds, {7: ["apple", "banana"]}, k=3).to_pandas()
    out = out.sort_values("rank").reset_index(drop=True)
    # doc1: tf=3 over 2 terms; doc2: tf=3 over 1 term; doc3: tf=2
    assert out.doc_id.tolist() == [1, 2, 3]
    assert out.tf_sum.tolist() == [3, 3, 2]
    assert out.n_terms.tolist() == [2, 1, 1]


def test_bm25_topk_matches_bruteforce():
    import math

    from session_graph_ray.ops.search import bm25_topk

    rng = np.random.RandomState(5)
    vocab = ["w%d" % i for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(5, 40)))
             for _ in range(80)]
    queries = {1: ["w1", "w2", "w3"], 2: ["w10", "w11"]}
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    out = bm25_topk(ds, queries, k=5).to_pandas()

    # brute-force reference
    k1, b = 1.2, 0.75
    toks = [t.split() for t in texts]
    N = len(toks)
    avg = sum(len(x) for x in toks) / N
    for qid, terms in queries.items():
        scores = []
        for d, tk in enumerate(toks):
            s = 0.0
            for term in terms:
                tf = tk.count(term)
                if tf == 0:
                    continue
                df = sum(1 for x in toks if term in x)
                idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avg))
            scores.append((d, s))
        ref = sorted([x for x in scores if x[1] > 0],
                     key=lambda x: (-x[1], x[0]))[:5]
        got = out[out.query_id == qid].sort_values("rank")
        assert got.doc_id.tolist() == [d for d, _ in ref]
        assert np.allclose(got.score.to_numpy(), [s for _, s in ref])


def test_bm25_df_reduce_is_term_bounded():
    """VERDICT r3 #2: a planted common term ('the' in EVERY doc) must not
    reach the driver as per-doc rows — each batch ships one <=|terms|
    bincount partial, and the reduced df is exact."""
    import pyarrow as pa

    from session_graph_ray.ops.search import _term_df, _term_hits, bm25_topk

    n = 400
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(
            [f"the quick w{i % 7} fox" for i in range(n)], pa.string()),
    })
    ds = rd.from_arrow(t).repartition(8)
    terms = ["the", "w3", "zzz_absent"]
    hits = _term_hits(ds, terms, "doc_id", "text")
    df = _term_df(hits, len(terms))
    assert df[0] == n          # 'the' appears in every doc
    assert df[1] == sum(1 for i in range(n) if i % 7 == 3)
    assert df[2] == 0
    # end-to-end: scores still rank the rare term above the common one
    out = bm25_topk(ds, {0: ["the"], 1: ["w3"]}, k=5).to_pandas()
    assert set(out.query_id) == {0, 1}
    assert (out.groupby("query_id")["rank"].max() == 5).all()


def test_broadcast_join_arrow_semantics():
    """VERDICT r3 #3: the Arrow-native gather must keep pandas.merge
    semantics — one-to-many fan-out, left-join null fill, null left keys
    never matching, and same-name keys collapsing to one column."""
    import pyarrow as pa

    from session_graph_ray.ops.join import broadcast_join

    lt = pa.table({"k": pa.array([1, 2, 2, 3, None, 5], pa.int64()),
                   "v": pa.array(list("abcdef"))})
    left = rd.from_arrow(lt).repartition(3)
    right = pd.DataFrame({"k2": [2, 2, 3, 4], "name": ["x", "y", "z", "w"]})

    inner = (broadcast_join(left, right, left_on="k", right_on="k2")
             .to_pandas().sort_values(["v", "name"]).reset_index(drop=True))
    assert list(zip(inner.v, inner.name)) == [
        ("b", "x"), ("b", "y"), ("c", "x"), ("c", "y"), ("d", "z")]

    lj = (broadcast_join(left, right, left_on="k", right_on="k2",
                         how="left").to_pandas())
    assert len(lj) == 8  # 2x2 fan-out + 1 match + 3 null-filled
    assert lj[lj.v == "e"].name.isna().all()   # null key never matches
    assert lj[lj.v == "f"].name.isna().all()   # unmatched key null-fills

    same = broadcast_join(
        left, pd.DataFrame({"k": [2, 3], "name": ["x", "z"]}), left_on="k"
    ).to_pandas()
    assert list(same.columns) == ["k", "v", "name"]  # single key column
