"""Text analysis operators over a documents table (training-data pipeline
extensions): token counting, quality scoring, language-ID heuristic, and
rolling-hash document fingerprinting.

These generalize the reference's content gates — min-length filter
(``/root/reference/pipeline/triple_extraction.py:539-540``), garbage-entity
screens (``triple_extraction.py:109-258``) — into reusable, vectorized
quality features. All regex state compiles once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# tiny public stopword sets for an n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "as", "on", "be", "at", "by"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "en", "un", "une", "du", "que", "pour", "dans", "qui", "au"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "auf", "für", "nicht", "ein", "eine", "im", "sich"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "en", "un", "una", "del", "que", "por", "para", "con", "se"},
}
_WORD_RE = re.compile(r"\w+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_CJK_RE = re.compile(r"[一-鿿]")


def token_count_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace-token count, vectorized: count of \\S+ runs.

    Exactly equals Python's ``len(s.split())`` and DuckDB's
    ``length(regexp_extract_all(s, '\\S+'))`` — the oracle contract.
    """
    return pc.cast(pc.count_substring_regex(col, r"\S+"), pa.int64())


def text_stats(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Per-document integer stats: n_tokens, n_chars, n_punct, n_digits."""

    def f(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": token_count_column(col),
                "n_chars": pc.cast(pc.utf8_length(col), pa.int64()),
                "n_punct": pc.cast(pc.count_substring_regex(col, r"[^\w\s]"), pa.int64()),
                "n_digits": pc.cast(pc.count_substring_regex(col, r"[0-9]"), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


class QualityScorer:
    """Actor-pool stage: heuristic quality + language ID per document.

    quality in [0,1]: length band + punctuation sanity + stopword presence
    (the reference's two-level garbage screens as a score, not a hard drop).
    lang_pred: argmax stopword-hit-rate over the known sets; CJK-codepoint
    dominance short-circuits to 'zh'; below min evidence -> 'unknown'.
    """

    def __init__(self):
        self.word = _WORD_RE
        self.stop = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs, quals, stop_ratios = [], [], []
        for t in texts:
            t = t or ""
            words = [w.lower() for w in self.word.findall(t)]
            n = len(words)
            cjk = len(_CJK_RE.findall(t))
            if cjk > 0 and cjk >= len(t) * 0.2:
                lang, hit = "zh", 0.0
            else:
                best, hit = "unknown", 0.0
                for lg, sw in self.stop.items():
                    r = sum(1 for w in words if w in sw) / n if n else 0.0
                    if r > hit:
                        best, hit = lg, r
                lang = best if hit >= 0.03 else "unknown"
            punct = len(_PUNCT_RE.findall(t))
            len_score = min(n / 20.0, 1.0)
            punct_score = 1.0 - min(punct / max(len(t), 1) * 4.0, 1.0)
            stop_score = min(hit * 10.0, 1.0) if lang != "zh" else 1.0
            langs.append(lang)
            stop_ratios.append(hit)
            quals.append(round(0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score, 6))
        out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
        out = out.append_column("lang_pred", pa.array(langs, pa.string()))
        out = out.append_column("stopword_ratio", pa.array(stop_ratios, pa.float64()))
        out = out.append_column("quality", pa.array(quals, pa.float64()))
        return out


def quality_scores(ds: "ray.data.Dataset", concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=2048,
        concurrency=concurrency, num_cpus=1,
    )


def rolling_fingerprint(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text",
    window: int = 8, base: int = 257, mod: int = (1 << 61) - 1,
) -> "ray.data.Dataset":
    """Deterministic document fingerprint: min over a rolling polynomial hash
    of word windows (a winnowing-style sketch, one uint64 per doc)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fps = []
        for t in texts:
            words = [w.lower() for w in _WORD_RE.findall(t or "")]
            if not words:
                fps.append(0)
                continue
            import zlib

            vals = np.array([zlib.crc32(w.encode()) for w in words], dtype=np.uint64)
            if len(vals) < window:
                h = 0
                for v in vals:
                    h = (h * base + int(v)) % mod
                fps.append(h)
                continue
            hashes = []
            h = 0
            pw = pow(base, window - 1, mod)
            for i, v in enumerate(vals):
                h = (h * base + int(v)) % mod
                if i >= window - 1:
                    hashes.append(h)
                    h = (h - int(vals[i - window + 1]) * pw) % mod
            fps.append(min(hashes))
        return pa.table(
            {id_col: batch.column(id_col),
             "fingerprint": pa.array([f"{x:016x}" for x in fps], pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")
