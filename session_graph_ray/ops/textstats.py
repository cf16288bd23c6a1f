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

    The kernel is fully vectorized: words come from ONE RE2 split per batch
    (``[^\\p{L}\\p{N}_]+`` — the Unicode-class equivalent of ``\\w+`` runs),
    stopword membership is evaluated once per DISTINCT token (dictionary
    encode), per-row hit counts fall out of a weighted ``bincount``. No
    Python touches individual rows.
    """

    _LANGS = list(_STOPWORDS)

    def __init__(self):
        self.stop = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        # null text == empty text (the row-loop predecessor's contract);
        # filling once up front keeps every count kernel NaN-free
        texts = _pc.fill_null(batch.column("text"), "")
        n_rows = len(batch)
        nchars = _pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        cjk = _pc.cast(
            _pc.count_substring_regex(texts, "[一-鿿]"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        punct = _pc.cast(
            _pc.count_substring_regex(texts, r"[^\p{L}\p{N}_\s]"), pa.int64()
        ).to_numpy(zero_copy_only=False)

        lists = _pc.split_pattern_regex(
            _pc.utf8_lower(texts), r"[^\p{L}\p{N}_]+"
        )
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        lengths = _pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
        keep = _pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row_ids = row_ids[keep]
        n_words = np.bincount(row_ids, minlength=n_rows).astype(np.int64)

        ratios = np.zeros((len(self._LANGS), n_rows), dtype=np.float64)
        if len(flat):
            enc = _pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dvals = enc.dictionary.to_pylist()
            nz = np.maximum(n_words, 1)
            for li, lg in enumerate(self._LANGS):
                sw = self.stop[lg]
                member = np.fromiter(
                    (v in sw for v in dvals), dtype=bool, count=len(dvals)
                )
                hits = np.bincount(row_ids[member[codes]], minlength=n_rows)
                ratios[li] = hits / nz
        hit = ratios.max(axis=0)
        best_idx = ratios.argmax(axis=0)  # first max — dict-order tie-break
        lang_arr = np.array(self._LANGS, dtype=object)[best_idx]
        lang_arr[hit < 0.03] = "unknown"
        is_zh = (cjk > 0) & (cjk >= nchars * 0.2)
        lang_arr[is_zh] = "zh"
        hit[is_zh] = 0.0

        len_score = np.minimum(n_words / 20.0, 1.0)
        punct_score = 1.0 - np.minimum(punct / np.maximum(nchars, 1) * 4.0, 1.0)
        stop_score = np.where(is_zh, 1.0, np.minimum(hit * 10.0, 1.0))
        qual_raw = 0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score
        qual = np.round(qual_raw, 6)

        # exact-oracle twins: every float op above is a plain IEEE-double
        # expression DuckDB evaluates bit-identically, so quantizing with
        # floor(x*1e6+0.5) (the doc_char_jaccard / bm25 house pattern) makes
        # the heuristic SQL-checkable value-for-value — np.round's banker's
        # rounding is the one op SQL can't mirror, hence quantizing qual_raw
        quality_micro = np.floor(qual_raw * 1e6 + 0.5).astype(np.int64)
        stop_micro = np.floor(hit * 1e6 + 0.5).astype(np.int64)

        out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
        out = out.append_column("lang_pred", pa.array(lang_arr, pa.string()))
        out = out.append_column("stopword_ratio", pa.array(hit, pa.float64()))
        out = out.append_column("quality", pa.array(qual, pa.float64()))
        out = out.append_column("stop_micro", pa.array(stop_micro, pa.int64()))
        out = out.append_column("quality_micro",
                                pa.array(quality_micro, pa.int64()))
        return out


def quality_scores(ds: "ray.data.Dataset", concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=2048,
        # autoscaling pool (min 1): a FIXED pool equal to the session CPU
        # budget can reserve every slot before the upstream read task runs
        # once — a scheduling deadlock observed at num_cpus=4 (pool idle,
        # read never scheduled). min=1 reserves one slot; the pool grows
        # into whatever the read/project stages aren't using.
        concurrency=(1, concurrency), num_cpus=1,
    )


def rolling_fingerprint(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text",
    window: int = 8,
) -> "ray.data.Dataset":
    """Deterministic document fingerprint: min over polynomial hashes of all
    word windows (a winnowing-style sketch, one u64-hex per doc).

    Vectorized across the whole batch: one RE2 split, each DISTINCT token
    hashed once (dictionary encode), window hashes via an n-term polynomial
    combine mod 2^64, per-doc min with ``np.minimum.at``. Docs shorter than
    ``window`` hash their full token span as one window (computed in the
    same masked vector pass); empty docs fingerprint to 0.
    """
    import pyarrow.compute as _pc

    from ..functions.hashing import hash64_np
    from ..functions.minhash import mix64

    P = np.uint64(0x100000001B3)

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        n_rows = len(batch)
        lists = _pc.split_pattern_regex(
            _pc.utf8_lower(_pc.fill_null(texts, "")), r"[^\p{L}\p{N}_]+"
        )
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        lengths = _pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
        keep = _pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row_ids = row_ids[keep]
        lengths = np.bincount(row_ids, minlength=n_rows).astype(np.int64)

        fp = np.zeros(n_rows, dtype=np.uint64)
        total = len(row_ids)
        if total:
            enc = _pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            th = mix64(hash64_np(enc.dictionary.to_pylist()))[codes]
            sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
            acc = np.full(n_rows, sentinel, dtype=np.uint64)
            with np.errstate(over="ignore"):
                if total >= window:
                    m = total - window + 1
                    h = np.zeros(m, dtype=np.uint64)
                    mult = np.uint64(1)
                    for k in range(window):
                        h += th[k : k + m] * mult
                        mult *= P
                    valid = row_ids[:m] == row_ids[window - 1 :]
                    np.minimum.at(acc, row_ids[:m][valid], mix64(h[valid]))
                # short docs: full-span hash, one masked vector pass per slot
                short = (lengths > 0) & (lengths < window)
                if short.any():
                    starts = np.cumsum(lengths) - lengths
                    hs = np.zeros(n_rows, dtype=np.uint64)
                    mult = np.uint64(1)
                    for k in range(window - 1):
                        sel = short & (lengths > k)
                        hs[sel] += th[starts[sel] + k] * mult
                        mult *= P
                    acc[short] = mix64(hs[short])
            done = acc != sentinel
            fp[done] = acc[done]
        return pa.table(
            {id_col: batch.column(id_col),
             "fingerprint": pa.array([f"{x:016x}" for x in fp.tolist()],
                                     pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")
