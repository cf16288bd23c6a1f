"""Text / path normalizers — the blocking-key derivation kernels.

Reference analogs: ``slug`` (lowercase, collapse non-alnum,
``/root/reference/pipeline/common.py:29-36``), ``normalize_entity``
(``/root/reference/pipeline/triple_extraction.py:340-345``), alias
normalization (``/root/reference/pipeline/link_entities.py:262-277``),
two-level garbage filters (``triple_extraction.py:109-258``,
``link_entities.py:80-255``).

All regexes are module-level compiled once; stage classes re-reference them
from ``__init__`` so actor pools pay compilation once per process.
"""

from __future__ import annotations

import re

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# above this many chars, content_tokens switches from whole-text findall to
# an early-exit finditer scan (cap-bounded work on degenerate huge rows)
_FINDALL_MAX_CHARS = 1 << 16
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")
_WS_RE = re.compile(r"\s+")

# Vendor-ish path prefixes stripped before stem normalization (the reference's
# alias-table idea — map surface variants to one canonical form,
# /root/reference/pipeline/link_entities.py:262-277 — applied to paths).
VENDOR_PREFIXES = (
    "vendor/",
    "third_party/",
    "thirdparty/",
    "node_modules/",
    "external/",
    "deps/",
)

# Language alias canonicalization (closed-vocabulary normalization; the
# reference's normalize_predicate maps to a closed 24-term vocabulary,
# /root/reference/pipeline/triple_extraction.py:348-374).
LANG_ALIASES = {
    "py": "python",
    "python3": "python",
    "js": "javascript",
    "node": "javascript",
    "ts": "typescript",
    "golang": "go",
    "rs": "rust",
    "md": "markdown",
    "c++": "cpp",
}


def canonical_lang(lang: str | None) -> str:
    if not lang:
        return "unknown"
    return LANG_ALIASES.get(lang.strip().lower(), lang.strip().lower())


def strip_vendor_prefix(path: str) -> str:
    """Remove leading vendor directories so vendored copies share keys."""
    p = path.lstrip("/")
    changed = True
    while changed:
        changed = False
        for pref in VENDOR_PREFIXES:
            if p.startswith(pref):
                p = p[len(pref) :]
                changed = True
    return p


def path_stem(path: str) -> str:
    """Basename without its final extension, vendor prefixes stripped."""
    p = strip_vendor_prefix(path)
    base = p.rsplit("/", 1)[-1]
    if "." in base[1:]:  # keep dotfiles like `.gitignore` whole
        base = base.rsplit(".", 1)[0]
    return base


def normalize_stem(stem: str) -> str:
    """Lowercase, split camelCase, collapse non-alphanumerics to single spaces.

    `AuthToken`, `auth_token`, `auth-tokens` all normalize into nearby forms so
    Jaro-Winkler on the normalized stem sees the true edit distance.
    """
    s = _CAMEL_RE.sub(" ", stem)
    s = s.lower()
    s = _NON_ALNUM_RE.sub(" ", s).strip()
    return _WS_RE.sub(" ", s)


def identifier_tokens(content: str, cap: int = 200) -> list[str]:
    """Distinct normalized identifier tokens of a source text, first-`cap` kept.

    camelCase and snake_case are split; tokens are lowercased; order of first
    appearance is preserved then the set is sorted for determinism.
    """
    seen: set[str] = set()
    for m in _IDENT_RE.finditer(content):
        tok = m.group(0)
        for part in _CAMEL_RE.split(tok):
            for sub in part.lower().split("_"):
                if len(sub) >= 2:
                    seen.add(sub)
        if len(seen) >= cap * 2:
            break
    return sorted(seen)[:cap]


def token_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """k-token shingles over an ordered token sequence (for MinHash)."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def content_tokens(content: str, cap: int = 2000) -> list[str]:
    """Ordered (non-deduped) identifier stream of a text, for shingling.

    Small texts: ``findall`` + slice (~3x faster than a per-match Python
    loop — the list is built in C). Large texts: ``islice`` over
    ``finditer`` so the scan STOPS at ``cap`` matches — the cap exists to
    bound per-row cost, and a whole-document findall on a 50 MB minified
    bundle would allocate millions of matches just to keep 2000."""
    if len(content) <= _FINDALL_MAX_CHARS:
        return [t.lower() for t in _IDENT_RE.findall(content)[:cap]]
    from itertools import islice

    return [m.group(0).lower() for m in islice(_IDENT_RE.finditer(content), cap)]


def is_scorable_content(content: str | None, min_chars: int = 8) -> bool:
    """Cheap garbage gate before any expensive work.

    Analog of the reference's min-length gate (skip texts < 30 chars,
    ``/root/reference/pipeline/triple_extraction.py:539-540``) and its
    two-level entity filters: empty / whitespace-only / binary-ish rows are
    never blocked or scored.
    """
    if content is None:
        return False
    c = content.strip()
    if len(c) < min_chars:
        return False
    # binary-ish: high ratio of non-printable characters
    sample = c[:256]
    bad = sum(1 for ch in sample if ord(ch) < 9 or (13 < ord(ch) < 32))
    return bad <= len(sample) * 0.05


_SOUNDEX_CODE = str.maketrans({
    **{c: "1" for c in "bfpv"}, **{c: "2" for c in "cgjkqsxz"},
    **{c: "3" for c in "dt"}, "l": "4", **{c: "5" for c in "mn"},
    "r": "6",
})


def soundex(word: str) -> str:
    """American Soundex (Knuth TAOCP vol. 3): first letter + three digits,
    adjacent duplicate codes collapsed, h/w transparent between duplicates,
    vowels break runs. Empty/non-alpha input -> ''."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    first = w[0]
    codes = [c.translate(_SOUNDEX_CODE) for c in w]
    codes = [c if len(c) == 1 and c.isdigit() else
             ("-" if c in ("h", "w") else "0") for c in codes]
    out = []
    prev = codes[0]
    for c in codes[1:]:
        if c == "-":          # h/w: transparent (duplicates still collapse)
            continue
        if c == "0":          # vowel: breaks a duplicate run
            prev = "0"
            continue
        if c != prev:
            out.append(c)
        prev = c
    return (first.upper() + "".join(out) + "000")[:4]
