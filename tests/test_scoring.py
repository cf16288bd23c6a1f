"""Stage-2 tests: the scorer actor class is smoked directly (actor __init__
errors surface late inside Ray — unit-test the callable, per ray_guide)."""

import pyarrow as pa

from session_graph_ray.config import ERConfig
from session_graph_ray.stages.scoring import PairScorer


def _tok(words):
    """Pack a token set the way normalize does: sorted unique crc32 uint32."""
    import numpy as np

    from session_graph_ray.functions.hashing import crc32_np

    if not words:
        return b""
    return np.unique(crc32_np(sorted(words))).astype("<u4").tobytes()


def _pair_batch(rows):
    cols = {
        "id_a": [], "id_b": [], "block_key": [],
        "sha_a": [], "sha_b": [], "stem_a": [], "stem_b": [],
        "tokens_a": [], "tokens_b": [], "trunc_a": [], "trunc_b": [],
    }
    for r in rows:
        for k in cols:
            cols[k].append(r[k])
    out = {}
    for k, v in cols.items():
        if k.startswith("tokens_"):
            out[k] = pa.array(v, pa.binary())
        elif k.startswith("sha_"):
            out[k] = pa.array(v, pa.uint64())
        else:
            out[k] = pa.array(v, pa.string())
    return pa.table(out)


def test_exact_sha_short_circuit():
    b = _pair_batch([
        dict(id_a="a", id_b="b", block_key="sha:x",
             sha_a=1, sha_b=1, stem_a="totally", stem_b="different",
             tokens_a=b"", tokens_b=b"", trunc_a="x", trunc_b="zzzz")
    ])
    out = PairScorer(ERConfig())(b).to_pydict()
    assert out["score"] == [1.0]
    assert out["jw"] == [1.0] and out["tj"] == [1.0]


def test_near_duplicate_scores_above_threshold():
    toks = _tok({"alpha", "beta", "gamma", "delta", "epsilon",
                 "zeta", "eta", "theta", "iota", "kappa"})
    toks_edit = _tok({"alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta", "iota", "lambda"})
    content = "def alpha(beta):\n    return gamma + delta\n" * 4
    content_edit = content.replace("delta", "felta", 1)
    b = _pair_batch([
        dict(id_a="a", id_b="b", block_key="stem:python:auth token",
             sha_a=1, sha_b=2, stem_a="auth token", stem_b="auth tokens",
             tokens_a=toks, tokens_b=toks_edit,
             trunc_a=content[:256], trunc_b=content_edit[:256])
    ])
    out = PairScorer(ERConfig())(b).to_pydict()
    assert out["score"][0] >= 0.7


def test_unrelated_pair_scores_below_threshold():
    b = _pair_batch([
        dict(id_a="a", id_b="b", block_key="stem:python:init",
             sha_a=1, sha_b=2, stem_a="init", stem_b="init",
             tokens_a=_tok(["aa", "bb", "cc", "dd"]),
             tokens_b=_tok(["ww", "xx", "yy", "zz"]),
             trunc_a="import os\nAA = 1\nBB = 2\n",
             trunc_b="class Widget:\n    def render(self): ...\n")
    ])
    out = PairScorer(ERConfig())(b).to_pydict()
    assert out["score"][0] < 0.7


def test_empty_tokens_no_false_jaccard():
    b = _pair_batch([
        dict(id_a="a", id_b="b", block_key="stem:python:x",
             sha_a=1, sha_b=2, stem_a="x", stem_b="x",
             tokens_a=b"", tokens_b=b"", trunc_a="foo", trunc_b="bar")
    ])
    out = PairScorer(ERConfig())(b).to_pydict()
    assert out["tj"] == [0.0]


def test_empty_batch():
    cfg = ERConfig()
    out = PairScorer(cfg)(_pair_batch([]))
    assert out.num_rows == 0
