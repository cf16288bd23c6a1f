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


def test_spill_gc_and_keyed_reuse(tmp_path):
    """_gc_spill_dir removes only stale spill files; keyed consolidation
    reuses an existing file byte-for-byte (no rewrite)."""
    import os
    import time

    from session_graph_ray.stages import scoring as S

    d = str(tmp_path)
    old = os.path.join(d, "feat-old.arrow")
    new = os.path.join(d, "feat-new.arrow")
    keep = os.path.join(d, "feat-keep.arrow")
    other = os.path.join(d, "notes.txt")
    for p in (old, new, keep, other):
        with open(p, "wb") as f:
            f.write(b"x")
    stale = time.time() - S._SPILL_TTL_S - 60
    os.utime(old, (stale, stale))
    os.utime(keep, (stale, stale))

    S._gc_spill_dir(d, keep=keep)
    assert not os.path.exists(old)        # stale, not kept -> swept
    assert os.path.exists(new)            # fresh -> kept
    assert os.path.exists(keep)           # stale but current run's -> kept
    assert os.path.exists(other)          # non-spill files untouched
