"""Unit tests for the scalar kernels (SURVEY.md §5 test plan)."""

import numpy as np

from session_graph_ray.functions.hashing import (
    crc32_str,
    file_id_of,
    sha256_hex,
    stable_bucket,
)
from session_graph_ray.functions.minhash import MinHasher, jaccard, simhash64
from session_graph_ray.functions.text import (
    canonical_lang,
    content_tokens,
    identifier_tokens,
    is_scorable_content,
    normalize_stem,
    path_stem,
    strip_vendor_prefix,
    token_shingles,
)


def test_file_id_deterministic():
    a = file_id_of("org/repo", "src/a.py", "deadbeef")
    assert a == file_id_of("org/repo", "src/a.py", "deadbeef")
    assert len(a) == 16
    assert a != file_id_of("org/repo", "src/a.py", "deadbee0")


def test_sha256_known_vector():
    assert (
        sha256_hex("abc")
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )


def test_path_normalization():
    assert strip_vendor_prefix("vendor/third_party/pkg/a.py") == "pkg/a.py"
    assert path_stem("src/utils/auth_token.py") == "auth_token"
    assert path_stem("a/.gitignore") == ".gitignore"
    assert normalize_stem("AuthToken") == "auth token"
    assert normalize_stem("auth_token") == "auth token"
    assert normalize_stem("auth-tokens") == "auth tokens"


def test_canonical_lang():
    assert canonical_lang("py") == "python"
    assert canonical_lang("Python3") == "python"
    assert canonical_lang(None) == "unknown"
    assert canonical_lang("haskell") == "haskell"


def test_identifier_tokens_split_and_cap():
    toks = identifier_tokens("def getUserName(user_id): return userId")
    assert "user" in toks and "name" in toks and "id" in toks and "def" in toks
    assert toks == sorted(toks)
    assert len(identifier_tokens("x " * 10_000 + " ".join(f"w{i}ab" for i in range(500)), cap=50)) <= 50


def test_scorable_gate():
    assert not is_scorable_content(None)
    assert not is_scorable_content("")
    assert not is_scorable_content("   \n\t ")
    assert not is_scorable_content("ab")
    assert is_scorable_content("def foo():\n    return 1")


def test_minhash_deterministic_and_similarity():
    mh1, mh2 = MinHasher(seed=42), MinHasher(seed=42)
    toks = content_tokens("def alpha_beta(gamma): return gamma + delta")
    sh = token_shingles(toks)
    assert np.array_equal(mh1.signature(sh), mh2.signature(sh))
    assert mh1.band_keys(mh1.signature(sh)) == mh2.band_keys(mh2.signature(sh))

    # near-identical shingle sets collide in at least one band
    base = [f"tok{i} tok{i+1} tok{i+2}" for i in range(100)]
    variant = base.copy()
    variant[3] = "zzz yyy xxx"
    k1 = set(mh1.band_keys(mh1.signature(base)))
    k2 = set(mh1.band_keys(mh1.signature(variant)))
    assert k1 & k2
    # unrelated sets do not share every band
    other = [f"q{i} r{i} s{i}" for i in range(100)]
    k3 = set(mh1.band_keys(mh1.signature(other)))
    assert not (k1 & k3)


def test_jaccard():
    assert jaccard(set("ab"), set("ab")) == 1.0
    assert jaccard(set(), set()) == 1.0
    assert jaccard(set("a"), set()) == 0.0
    assert jaccard({"a", "b"}, {"b", "c"}) == 1 / 3


def test_simhash_near_vs_far():
    a = [f"w{i}" for i in range(64)]
    b = a[:-2] + ["zz", "qq"]
    c = [f"v{i}" for i in range(64)]
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    assert ha == simhash64(a)
    near = bin(ha ^ hb).count("1")
    far = bin(ha ^ hc).count("1")
    assert near < far


def test_stable_bucket_range():
    assert 0 <= stable_bucket("anything", 7) < 7
    assert stable_bucket("k", 16) == crc32_str("k") % 16


def test_flat_batch_minhash_bit_identical_to_per_row():
    """The batch kernels (shingles_flat / signatures_flat /
    band_keys_u64_batch) must be bit-identical to the per-row path they
    replaced in the blocking stage — including empty rows (sentinel
    signature) and short rows (0 < n < k fold all n tokens)."""
    import numpy as np

    from session_graph_ray.functions.hashing import hash64_np
    from session_graph_ray.functions.minhash import (
        MinHasher,
        shingle_vals,
        shingles_flat,
    )

    rng = np.random.RandomState(7)
    mh = MinHasher(num_perm=64, bands=16, seed=42)
    rows = []
    for n in [0, 1, 2, 3, 4, 7, 50, 0, 1, 200]:
        rows.append([f"tok{rng.randint(0, 30)}" for _ in range(n)])
    k = 3
    sizes = np.array([len(r) for r in rows], dtype=np.int64)
    flat = hash64_np([t for r in rows for t in r])
    svals, scounts = shingles_flat(flat, sizes, k)
    sigs = mh.signatures_flat(svals, scounts)
    bkeys = mh.band_keys_u64_batch(sigs)
    off = 0
    for i, r in enumerate(rows):
        vals = shingle_vals(hash64_np(r), k)
        assert scounts[i] == vals.size or (not r and scounts[i] == 0)
        got = np.sort(svals[off : off + scounts[i]])
        assert np.array_equal(got, np.sort(vals)), f"row {i} shingles differ"
        off += scounts[i]
        sig = mh.signature_from_vals(vals)
        assert np.array_equal(sigs[i], sig), f"row {i} signature differs"
        assert np.array_equal(bkeys[i], mh.band_keys_u64(sig)), f"row {i} bands"
