"""PII detection and redaction over a text column (training-data pipeline
extension; generalizes the reference's content-screening gates,
``/root/reference/pipeline/triple_extraction.py:109-258``, from entity
garbage to personal-data patterns).

Fully vectorized: every pattern runs as ONE Arrow RE2 kernel per batch
(``count_substring_regex`` / ``replace_substring_regex``) — no Python row
loop, no actor state needed. The pattern set is RE2-only syntax on purpose:
DuckDB's regexp functions are also RE2, so ``regexp_replace(text, pat, repl,
'g')`` is an exact oracle for the redaction and counts, which is what the
``doc_pii_redact`` query checks end to end.

At 100 TB this stage is a stateless ``map_batches`` — streams block by
block, no shuffle, CPU-bound in the RE2 kernels.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# RE2-compatible (works identically in Arrow and DuckDB). Keep patterns
# anchored with \b where digits could run into surrounding text.
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_scrub(
    ds: "rd.Dataset",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    redacted_col: str = "text_redacted",
    count_prefix: str = "n_",
) -> "rd.Dataset":
    """Append per-row PII match counts and a redacted text column.

    Patterns apply in dict order (earlier redactions can mask later
    patterns — e.g. an email's digits never double-count as a phone), each
    match replaced by ``[<NAME>]``. Counts are taken BEFORE that pattern's
    own replacement but AFTER all earlier ones, mirroring a chained SQL
    ``regexp_replace`` oracle exactly.
    """
    pats = dict(patterns or DEFAULT_PATTERNS)

    def f(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        out = t
        for name, pat in pats.items():
            n = pc.cast(pc.count_substring_regex(col, pat), pa.int64())
            out = out.append_column(f"{count_prefix}{name}", n)
            col = pc.replace_substring_regex(col, pat, f"[{name.upper()}]")
        return out.append_column(redacted_col, col)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096)


def pii_filter(
    ds: "rd.Dataset",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> "rd.Dataset":
    """Drop rows containing ANY of the PII patterns (hard-gate variant)."""
    pats = dict(patterns or DEFAULT_PATTERNS)

    def f(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        bad = pa.array([False] * len(t))
        for pat in pats.values():
            bad = pc.or_(bad, pc.match_substring_regex(col, pat))
        return t.filter(pc.invert(bad))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096)
