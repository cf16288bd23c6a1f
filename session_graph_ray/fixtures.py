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
from .functions.text import (
    canonical_lang,
    content_tokens,
    normalize_stem,
    path_stem,
)

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


SIZES = {"small": 600, "bench": 400000, "benchxl": 800000,
         "benchxxl": 3000000, "tiny": 60}

_FIXTURE_VERSION = "v3"  # bump on any change to generation or blocking keys


def _shard_bounds(total: int, n_shards: int, si: int) -> tuple[int, int]:
    per = -(-total // n_shards)
    return si * per, min(total, (si + 1) * per)


def _gen_shard(args) -> dict:
    """Generate one deterministic shard of the corpus (parallel worker).

    Each shard owns a contiguous base-index range; its rng seeds from
    (seed, shard), so the corpus is byte-identical for any worker count.
    Everything label-related is shard-local: intra-cluster co-blocking is
    checked inside the shard (clusters never span shards), only the
    hot-name negative pairs need the driver's global view.
    """
    (si, n_shards, n_base, seed, pool, repos, out_dir) = args
    rng = np.random.RandomState((seed * 1_000_003 + si) % (2**31 - 1))
    mh = MinHasher()  # pipeline-identical params => honest 'mh:' labels

    rows: list[dict] = []
    clusters: list[list[int]] = []
    mh_only = 0

    def add_row(repo, path, commit, lang, content) -> int:
        rows.append(
            {"repo": repo, "path": path, "commit": commit, "lang": lang,
             "content": content}
        )
        return len(rows) - 1

    lo, hi = _shard_bounds(n_base, n_shards, si)
    for _b in range(lo, hi):
        lang, ext = _LANGS[rng.randint(len(_LANGS))]
        repo = repos[rng.randint(len(repos))]
        depth = rng.randint(1, 4)
        dirs = "/".join(pool[rng.randint(len(pool))] for _ in range(depth))
        stem = "_".join(pool[rng.randint(len(pool))] for _ in range(rng.randint(1, 3)))
        path = f"{dirs}/{stem}{ext}"
        content = _gen_content(rng, pool, ident_count=rng.randint(18, 40))
        base_idx = add_row(repo, path, _commit(rng), lang, content)

        if rng.random_sample() < 0.35:  # this base gets a duplicate cluster
            members = [base_idx]
            for _ in range(rng.randint(1, 5)):
                kind = rng.randint(5)
                other_repo = repos[rng.randint(len(repos))]
                if kind == 0:  # exact copy
                    j = add_row(other_repo, path, _commit(rng), lang, content)
                elif kind == 1:  # path rename, identical content
                    j = add_row(repo, _rename_stem(rng, path), _commit(rng), lang, content)
                elif kind == 2:  # small content edit, same path
                    j = add_row(other_repo, path, _commit(rng), lang,
                                _edit_content(rng, content, pool, 0.05))
                elif kind == 3:  # vendored copy
                    pref = ["vendor/", "third_party/"][rng.randint(2)]
                    j = add_row(other_repo, pref + path, _commit(rng), lang, content)
                else:  # rename + light edit: only MinHash bands co-block it
                    j = add_row(other_repo, _rename_stem(rng, path), _commit(rng),
                                lang, _edit_content(rng, content, pool, 0.03))
                    mh_only += 1
                members.append(j)
            clusters.append(members)
        else:
            clusters.append([base_idx])

    # hot-name skew files: unrelated contents sharing one stem+lang block
    n_hot = max(12, n_base // 10)
    hlo, hhi = _shard_bounds(n_hot, n_shards, si)
    hot_fid_pos: list[tuple[int, int, int]] = []  # (global h, hot family, row idx)
    for h in range(hlo, hhi):
        name, lang = _HOT_NAMES[h % len(_HOT_NAMES)]
        repo = repos[rng.randint(len(repos))]
        content = _gen_content(rng, pool, ident_count=rng.randint(18, 40))
        i = add_row(repo, f"pkg{h}/{name}", _commit(rng), lang, content)
        clusters.append([i])
        hot_fid_pos.append((h, h % len(_HOT_NAMES), i))

    # filter-path coverage: empty / whitespace-only rows (singletons)
    n_empty = max(4, n_base // 150)
    elo, ehi = _shard_bounds(n_empty, n_shards, si)
    for e in range(elo, ehi):
        lang, ext = _LANGS[rng.randint(len(_LANGS))]
        i = add_row(
            repos[rng.randint(len(repos))], f"empty/e{e}{ext}", _commit(rng),
            lang, "" if e % 2 == 0 else "   \n\t  \n",
        )
        clusters.append([i])

    # ---- ids + shard parquet -------------------------------------------
    fids = [file_id_of(r["repo"], r["path"], r["commit"]) for r in rows]
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
    pq.write_table(
        corpus, os.path.join(out_dir, "corpus", f"part-{si:05d}.parquet"),
        row_group_size=8192,
    )

    # ---- shard-local labeled pairs (BASELINE.json metric scope) ---------
    # Only pairs that verifiably co-occur under a blocking key are labeled,
    # exactly the way the pipeline blocks (sha key / lang+stem key / MinHash
    # band overlap); expected clusters are the components reachable through
    # those co-blocked pairs.
    from .functions.hashing import hash64_np
    from .functions.minhash import shingle_vals

    sig_cache: dict[int, set] = {}

    def bands_of(i: int) -> set:
        # EXACTLY the pipeline's derivation (stages/blocking.explode_keys_batch)
        if i not in sig_cache:
            toks = content_tokens(rows[i]["content"])
            sig = mh.signature_from_vals(shingle_vals(hash64_np(toks), 3))
            sig_cache[i] = set(mh.band_keys_u64(sig).tolist())
        return sig_cache[i]

    def stem_key(i: int) -> str:
        r = rows[i]
        return f"{canonical_lang(r['lang'])}:{normalize_stem(path_stem(r['path']))}"

    labeled: list[tuple[str, str, str, bool]] = []
    pos_edges: list[tuple[str, str]] = []
    mh_hits = 0

    def ordered(i, j):
        a, b = fids[i], fids[j]
        return (a, b) if a < b else (b, a)

    for members in clusters:
        for x in range(len(members) - 1):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                a, b = ordered(i, j)
                if shas[i] == shas[j]:
                    labeled.append((a, b, f"sha:{shas[i][:16]}", True))
                elif stem_key(i) == stem_key(j):
                    labeled.append((a, b, f"stem:{stem_key(i)}", True))
                else:
                    shared = bands_of(i) & bands_of(j)
                    if shared:
                        labeled.append((a, b, f"mh:{sorted(shared)[0]}", True))
                        mh_hits += 1
                    else:
                        continue  # not co-blocked under any key -> out of scope
                pos_edges.append((fids[i], fids[j]))

    return {
        "fids": fids,
        "shas": shas,
        "labeled": labeled,
        "pos_edges": pos_edges,
        "hot": [(h, fam, fids[i]) for h, fam, i in hot_fid_pos],
        "mh_only": mh_only,
        "mh_hits": mh_hits,
        "n_clusters": sum(1 for c in clusters if len(c) > 1),
    }


def generate_corpus(out_dir: str, size: str = "small", seed: int = 42) -> dict:
    """Write corpus / labeled_pairs / expected_clusters / invariants parquet.

    Deterministic for any worker count (per-shard seeded rngs); idempotent
    (a marker keyed by size+rows+seed+version skips regeneration). Shards
    generate AND label in parallel; only the cross-shard pieces (hot-name
    negative pairs, the union-find over positive edges) run on the driver.
    """
    import json

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f".done-{size}-{SIZES[size]}-{seed}-{_FIXTURE_VERSION}")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)

    n_base = SIZES[size]
    rng = np.random.RandomState(seed)
    pool = _word_pool(rng)
    repos = [f"org{i % 37}/proj{i}" for i in range(max(8, n_base // 12))]
    n_shards = max(1, min(16, n_base // 8192))
    os.makedirs(os.path.join(out_dir, "corpus"), exist_ok=True)

    args = [
        (si, n_shards, n_base, seed, pool, repos, out_dir)
        for si in range(n_shards)
    ]
    if n_shards == 1:
        shards = [_gen_shard(args[0])]
    else:
        import concurrent.futures as cf

        with cf.ProcessPoolExecutor(max_workers=min(n_shards, os.cpu_count() or 4)) as ex:
            shards = list(ex.map(_gen_shard, args))

    fids = [f for sh in shards for f in sh["fids"]]
    shas = [s for sh in shards for s in sh["shas"]]
    assert len(set(fids)) == len(fids), "file_id collision in generator"

    pq.write_table(
        pa.table(
            {"file_id": pa.array(fids, pa.string()),
             "content_sha256": pa.array(shas, pa.string())}
        ),
        os.path.join(out_dir, "invariants.parquet"),
    )

    # ---- expected clusters: union-find over co-blocked positive pairs;
    # canonical = min(file_id) (order-free — fixes the reference's
    # list-order uris[0] election, link_entities.py:749)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for sh in shards:
        for a, b in sh["pos_edges"]:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    comp: dict[str, list[str]] = {}
    for f in fids:
        comp.setdefault(find(f), []).append(f)
    cl_fid, cl_cid, cl_canon = [], [], []
    for members in comp.values():
        canon = min(members)
        for f in members:
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

    # ---- negative same-block pairs: hot-name files share a stem+lang block
    labeled: list[tuple[str, str, str, bool]] = [
        t for sh in shards for t in sh["labeled"]
    ]
    hot_by_fam: dict[int, list[tuple[int, str]]] = {}
    for sh in shards:
        for h, fam, fid in sh["hot"]:
            hot_by_fam.setdefault(fam, []).append((h, fid))
    neg = 0
    for fam in sorted(hot_by_fam):
        idxs = [fid for _h, fid in sorted(hot_by_fam[fam])]
        for x in range(len(idxs) - 1):
            if neg >= 4000:
                break
            a, b = idxs[x], idxs[x + 1]
            labeled.append((min(a, b), max(a, b), "stem", False))
            if len(idxs) > 7:
                a, b = idxs[x], idxs[(x + 7) % len(idxs)]
                labeled.append((min(a, b), max(a, b), "stem", False))
            neg += 1

    seen_pairs: dict[tuple[str, str], tuple[str, bool]] = {}
    for a, b, k, m in labeled:
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
        "rows": len(fids),
        "clusters": sum(sh["n_clusters"] for sh in shards),
        "labeled_pairs": len(seen_pairs),
        "positives": sum(1 for v in seen_pairs.values() if v[1]),
        "mh_only_pairs": sum(sh["mh_only"] for sh in shards),
        "mh_band_hits": sum(sh["mh_hits"] for sh in shards),
        "seed": seed,
        "size": size,
        "n_shards": n_shards,
    }
    with open(marker, "w") as f:
        json.dump(summary, f)
    return summary


def default_corpus_dir(size: str = "small", seed: int = 42) -> str:
    return f"/tmp/sgr_corpus/{size}-{seed}"


def ensure_corpus(size: str = "small", seed: int = 42) -> str:
    d = default_corpus_dir(size, seed)
    generate_corpus(d, size=size, seed=seed)
    return d
