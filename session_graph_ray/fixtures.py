"""Deterministic synthetic ER corpus generator (FIXTURES.md tables 1-4).

Mirrors the reference's golden-fixture idea — a tiny, LLM-free, deterministic
input with exact expected outputs (``/root/reference/tests/fixtures/
sample_session.jsonl`` -> 48 triples, ``/root/reference/CHANGELOG.md:10``) —
promoted to a corpus with planted ground-truth duplicate clusters:

- exact copy into another repo          -> caught by the content-sha block
- path rename, identical content        -> caught by the content-sha block
- small content edit (<=5% token subs)  -> caught by stem block + MinHash bands
- vendored copy (vendor/ prefix)        -> caught by sha block + path rules
- rename + edit combo                   -> caught ONLY by MinHash bands
- hot-name files (__init__.py, index.js, Makefile) -> skew + negative pairs
- singletons and empty/whitespace rows  -> filter-path coverage

Seed-stable: same (seed, size) => byte-identical tables.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.hashing import file_id_of, sha256_hex
from .functions.minhash import MinHasher
from .functions.text import content_tokens, token_shingles

_WORDS = None


def _word_pool(rng: np.random.RandomState, n: int = 2400) -> list[str]:
    """Deterministic pseudo-word identifier pool."""
    consonants = "bcdfghklmnprstvwz"
    vowels = "aeiou"
    words = set()
    while len(words) < n:
        ln = rng.randint(2, 5)
        w = "".join(
            consonants[rng.randint(len(consonants))] + vowels[rng.randint(len(vowels))]
            for _ in range(ln)
        )
        words.add(w)
    return sorted(words)


_LANGS = [
    ("python", ".py"),
    ("javascript", ".js"),
    ("typescript", ".ts"),
    ("go", ".go"),
    ("java", ".java"),
    ("rust", ".rs"),
    ("markdown", ".md"),
]

_HOT_NAMES = [("__init__.py", "python"), ("index.js", "javascript"), ("Makefile", "go")]


def _gen_content(rng: np.random.RandomState, pool: list[str], ident_count: int) -> str:
    """Template source text over a per-file identifier sub-pool."""
    idents = [pool[i] for i in rng.choice(len(pool), size=ident_count, replace=False)]
    n_funcs = rng.randint(2, 9)
    lines = []
    for _ in range(n_funcs):
        name = "_".join(
            idents[rng.randint(len(idents))] for _ in range(rng.randint(1, 3))
        )
        args = ", ".join(
            idents[rng.randint(len(idents))] for _ in range(rng.randint(0, 4))
        )
        lines.append(f"def {name}({args}):")
        for _ in range(rng.randint(1, 6)):
            a = idents[rng.randint(len(idents))]
            b = idents[rng.randint(len(idents))]
            op = ["+", "-", "*", "return", "="][rng.randint(5)]
            if op == "return":
                lines.append(f"    return {a}_{b}")
            elif op == "=":
                lines.append(f"    {a} = {b}({a})")
            else:
                lines.append(f"    {a} {op}= {b}")
        lines.append("")
    return "\n".join(lines)


def _edit_content(
    rng: np.random.RandomState, content: str, pool: list[str], frac: float
) -> str:
    """Substitute ~frac of identifier tokens with pool words (<=5% per spec)."""
    import re

    toks = re.split(r"(\W+)", content)
    out = []
    for t in toks:
        if t and t[0].isalnum() and len(t) >= 2 and rng.random_sample() < frac:
            out.append(pool[rng.randint(len(pool))])
        else:
            out.append(t)
    return "".join(out)


def _rename_stem(rng: np.random.RandomState, path: str) -> str:
    """Stem edit distance <= 2: e.g. auth_token.py -> auth-tokens.py."""
    d, _, base = path.rpartition("/")
    if "." in base[1:]:
        stem, _, ext = base.rpartition(".")
        ext = "." + ext
    else:
        stem, ext = base, ""
    choice = rng.randint(3)
    if choice == 0:
        stem = stem.replace("_", "-") if "_" in stem else stem + "s"
    elif choice == 1:
        stem = stem + "s"
    else:
        stem = stem + "_v2"
    return (d + "/" if d else "") + stem + ext


def _commit(rng: np.random.RandomState) -> str:
    return "".join("0123456789abcdef"[rng.randint(16)] for _ in range(40))


SIZES = {"small": 600, "bench": 100000, "benchxl": 300000, "tiny": 60}


def generate_corpus(out_dir: str, size: str = "small", seed: int = 42) -> dict:
    """Write corpus / labeled_pairs / expected_clusters / invariants parquet.

    Returns summary counts. Idempotent: if out_dir holds a matching manifest,
    generation is skipped (same seed => same bytes anyway).
    """
    os.makedirs(out_dir, exist_ok=True)
    # v2: band keys follow the pipeline's numeric shingle hashing (hash64 of
    # tokens -> rolling combine -> multiply-shift MinHash); bump on any change
    # to the blocking key derivation so cached labels never go stale
    marker = os.path.join(out_dir, f".done-{size}-{seed}-v2")
    if os.path.exists(marker):
        import json

        with open(marker) as f:
            return json.load(f)

    n_base = SIZES[size]
    rng = np.random.RandomState(seed)
    pool = _word_pool(rng)
    mh = MinHasher()  # pipeline-identical params => honest 'mh:' labels

    repos = [f"org{i % 37}/proj{i}" for i in range(max(8, n_base // 12))]

    rows: list[dict] = []  # repo, path, commit, lang, content
    clusters: list[list[int]] = []  # row indices per planted cluster
    mh_only_pairs: list[tuple[int, int]] = []  # pairs only minhash can block
    stem_edit_pairs: list[tuple[int, int]] = []  # content-edit pairs (stem block)
    sha_pairs: list[tuple[int, int]] = []  # identical-content pairs

    def add_row(repo, path, commit, lang, content) -> int:
        rows.append(
            {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}
        )
        return len(rows) - 1

    for b in range(n_base):
        lang, ext = _LANGS[rng.randint(len(_LANGS))]
        repo = repos[rng.randint(len(repos))]
        depth = rng.randint(1, 4)
        dirs = "/".join(pool[rng.randint(len(pool))] for _ in range(depth))
        stem = "_".join(pool[rng.randint(len(pool))] for _ in range(rng.randint(1, 3)))
        path = f"{dirs}/{stem}{ext}"
        content = _gen_content(rng, pool, ident_count=rng.randint(18, 40))
        base_idx = add_row(repo, path, _commit(rng), lang, content)

        r = rng.random_sample()
        if r < 0.35:  # this base gets a duplicate cluster
            members = [base_idx]
            n_var = rng.randint(1, 5)
            for _ in range(n_var):
                kind = rng.randint(5)
                other_repo = repos[rng.randint(len(repos))]
                if kind == 0:  # exact copy
                    j = add_row(other_repo, path, _commit(rng), lang, content)
                    sha_pairs.append((base_idx, j))
                elif kind == 1:  # path rename, identical content
                    j = add_row(repo, _rename_stem(rng, path), _commit(rng), lang, content)
                    sha_pairs.append((base_idx, j))
                elif kind == 2:  # small content edit, same path
                    edited = _edit_content(rng, content, pool, 0.05)
                    j = add_row(other_repo, path, _commit(rng), lang, edited)
                    stem_edit_pairs.append((base_idx, j))
                elif kind == 3:  # vendored copy
                    pref = ["vendor/", "third_party/"][rng.randint(2)]
                    j = add_row(other_repo, pref + path, _commit(rng), lang, content)
                    sha_pairs.append((base_idx, j))
                else:  # rename + light edit: only MinHash bands co-block it
                    edited = _edit_content(rng, content, pool, 0.03)
                    j = add_row(
                        other_repo, _rename_stem(rng, path), _commit(rng), lang, edited
                    )
                    mh_only_pairs.append((base_idx, j))
                members.append(j)
            clusters.append(members)
        else:
            clusters.append([base_idx])

    # hot-name skew files: unrelated contents sharing one stem+lang block
    n_hot = max(12, n_base // 10)
    for h in range(n_hot):
        name, lang = _HOT_NAMES[h % len(_HOT_NAMES)]
        repo = repos[rng.randint(len(repos))]
        content = _gen_content(rng, pool, ident_count=rng.randint(18, 40))
        i = add_row(repo, f"pkg{h}/{name}", _commit(rng), lang, content)
        clusters.append([i])

    # filter-path coverage: empty / whitespace-only rows (singletons)
    for e in range(max(4, n_base // 150)):
        lang, ext = _LANGS[rng.randint(len(_LANGS))]
        i = add_row(
            repos[rng.randint(len(repos))],
            f"empty/e{e}{ext}",
            _commit(rng),
            lang,
            "" if e % 2 == 0 else "   \n\t  \n",
        )
        clusters.append([i])

    # ---- materialize ids and tables -------------------------------------
    fids = [file_id_of(r["repo"], r["path"], r["commit"]) for r in rows]
    assert len(set(fids)) == len(fids), "file_id collision in generator"
    shas = [sha256_hex(r["content"]) for r in rows]

    corpus = pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "commit": pa.array([r["commit"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.large_string()),
        }
    )
    # sharded layout (one dir, ~8k-row part files): read parallelism at 32
    # CPUs needs many input files/row-groups, and a sharded corpus mirrors the
    # partitioned-input reality of a web-scale run (resumable-output rule)
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    shard_rows = 8192
    n_shards = max(1, (corpus.num_rows + shard_rows - 1) // shard_rows)
    for si in range(n_shards):
        pq.write_table(
            corpus.slice(si * shard_rows, shard_rows),
            os.path.join(corpus_dir, f"part-{si:05d}.parquet"),
            row_group_size=shard_rows,
        )

    invariants = pa.table(
        {"file_id": pa.array(fids, pa.string()), "content_sha256": pa.array(shas, pa.string())}
    )
    pq.write_table(invariants, os.path.join(out_dir, "invariants.parquet"))

    # ---- labeled same-block pairs ---------------------------------------
    # The metric (BASELINE.json) scopes F1 to pairs AT THE SAME BLOCKING KEY,
    # so only pairs that verifiably co-occur under a key are labeled, and the
    # expected clusters are the connected components REACHABLE through those
    # co-blocked pairs (ground truth conditioned on the blocking design —
    # mh-band misses, ~1% of rename+edit variants, are out of metric scope).
    def ordered(i, j):
        a, b = fids[i], fids[j]
        return (a, b) if a < b else (b, a)

    la, lb, lkey, lmatch = [], [], [], []
    pos_edges: list[tuple[int, int]] = []  # co-blocked true-match row pairs

    def label(i, j, key, is_match):
        a, b = ordered(i, j)
        la.append(a)
        lb.append(b)
        lkey.append(key)
        lmatch.append(is_match)
        if is_match:
            pos_edges.append((i, j))

    # every intra-cluster pair is checked for co-blocking exactly the way the
    # pipeline blocks (sha key / lang+stem key / MinHash band overlap) — the
    # reachable closure can run through sibling variants, not just the base
    from .functions.text import canonical_lang, normalize_stem, path_stem

    sig_cache: dict[int, set] = {}

    def bands_of(i: int) -> set:
        # EXACTLY the pipeline's derivation (stages/blocking.explode_keys_batch):
        # content_tokens -> hash64 -> rolling shingle combine -> minhash bands
        if i not in sig_cache:
            from .functions.hashing import hash64_np
            from .functions.minhash import shingle_vals

            toks = content_tokens(rows[i]["content"])
            sig = mh.signature_from_vals(shingle_vals(hash64_np(toks), 3))
            sig_cache[i] = set(mh.band_keys_u64(sig).tolist())
        return sig_cache[i]

    def stem_key(i: int) -> str:
        r = rows[i]
        return f"{canonical_lang(r['lang'])}:{normalize_stem(path_stem(r['path']))}"

    mh_hits = 0
    for members in clusters:
        for x in range(len(members) - 1):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                if shas[i] == shas[j]:
                    label(i, j, f"sha:{shas[i][:16]}", True)
                elif stem_key(i) == stem_key(j):
                    label(i, j, f"stem:{stem_key(i)}", True)
                else:
                    shared = bands_of(i) & bands_of(j)
                    if shared:
                        label(i, j, f"mh:{sorted(shared)[0]}", True)
                        mh_hits += 1
                    # else: not co-blocked under any key -> out of metric scope

    # expected clusters: union-find over co-blocked positive pairs;
    # canonical = min(file_id) (order-free, fixes the reference's list-order
    # uris[0] election, link_entities.py:749)
    parent = list(range(len(rows)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in pos_edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
    comp: dict[int, list[int]] = {}
    for i in range(len(rows)):
        comp.setdefault(find(i), []).append(i)
    cl_fid, cl_cid, cl_canon = [], [], []
    for members in comp.values():
        mfids = [fids[i] for i in members]
        canon = min(mfids)
        for f in mfids:
            cl_fid.append(f)
            cl_cid.append(f"c-{canon}")
            cl_canon.append(canon)
    pq.write_table(
        pa.table(
            {
                "file_id": pa.array(cl_fid, pa.string()),
                "cluster_id": pa.array(cl_cid, pa.string()),
                "canonical_file_id": pa.array(cl_canon, pa.string()),
            }
        ),
        os.path.join(out_dir, "expected_clusters.parquet"),
    )

    # negative same-block pairs: hot-name files share a stem+lang block
    hot_rows: dict[tuple[str, str], list[int]] = {}
    for idx, r in enumerate(rows):
        base = r["path"].rsplit("/", 1)[-1]
        for name, lang in _HOT_NAMES:
            if base == name:
                hot_rows.setdefault((name, lang), []).append(idx)
    neg = 0
    for (_name, _lang), idxs in hot_rows.items():
        for x in range(len(idxs) - 1):
            if neg >= 4000:
                break
            label(idxs[x], idxs[x + 1], "stem", False)
            label(idxs[x], idxs[(x + 7) % len(idxs)], "stem", False) if len(idxs) > 7 else None
            neg += 1

    # dedup labels on the (a,b) pair
    seen_pairs = {}
    for a, b, k, m in zip(la, lb, lkey, lmatch):
        if a == b:
            continue
        seen_pairs.setdefault((a, b), (k, m))
    pq.write_table(
        pa.table(
            {
                "file_id_a": pa.array([p[0] for p in seen_pairs], pa.string()),
                "file_id_b": pa.array([p[1] for p in seen_pairs], pa.string()),
                "block_key": pa.array([v[0] for v in seen_pairs.values()], pa.string()),
                "is_match": pa.array([v[1] for v in seen_pairs.values()], pa.bool_()),
            }
        ),
        os.path.join(out_dir, "labeled_pairs.parquet"),
    )

    summary = {
        "rows": len(rows),
        "clusters": sum(1 for c in clusters if len(c) > 1),
        "labeled_pairs": len(seen_pairs),
        "positives": sum(1 for v in seen_pairs.values() if v[1]),
        "mh_only_pairs": len(mh_only_pairs),
        "mh_band_hits": mh_hits,
        "seed": seed,
        "size": size,
    }
    import json

    with open(marker, "w") as f:
        json.dump(summary, f)
    return summary


def default_corpus_dir(size: str = "small", seed: int = 42) -> str:
    return f"/tmp/sgr_corpus/{size}-{seed}"


def ensure_corpus(size: str = "small", seed: int = 42) -> str:
    d = default_corpus_dir(size, seed)
    generate_corpus(d, size=size, seed=seed)
    return d
