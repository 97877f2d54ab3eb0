"""Unit tests for scalar/vectorized kernels (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pytest

from ember_ray.functions.minhash import (
    char_shingles,
    hamming64,
    lsh_band_keys,
    minhash_signatures,
    simhash,
)
from ember_ray.functions.similarity import (
    StringSimKernel,
    batch_jaccard,
    batch_tfidf_cosine,
    jaccard_py,
    jaro_winkler_py,
    levenshtein_py,
)
from ember_ray.functions.text import concat_coalesce, normalize, tokenize_array, tokenize_py
from ember_ray.util import canonical_pairs, stable_hash64


def test_tokenize_matches_py():
    texts = [
        "Hello, World!  foo",
        "color#:#red#;#size#:#XL",
        "",
        "  a  b\tc\nd ",
        "UPPER lower MiXeD.",
    ]
    arr = pa.array(texts, pa.string())
    out = tokenize_array(arr).to_pylist()
    assert out == [tokenize_py(t) for t in texts]
    assert out[1] == ["color", "red", "size", "xl"]
    assert out[2] == []


def test_normalize_flattens_attr_separators():
    arr = pa.array(["k#:#v#;#x#:#y"])
    assert normalize(arr).to_pylist() == ["k v x y"]


def test_concat_coalesce():
    a = pa.array(["x", None])
    b = pa.array([None, "y"])
    assert concat_coalesce([a, b]).to_pylist() == ["x ", " y"]


def test_jaccard_reference_semantics():
    # build_ali_dataset.py:44-47 semantics
    assert jaccard_py(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
    assert jaccard_py([], []) == 0.0
    assert jaccard_py(["a"], ["a", "a"]) == 1.0


def test_batch_jaccard_matches_py():
    left = pa.array([["a", "b", "c"], ["x"], [], ["q", "q", "r"]], pa.list_(pa.string()))
    right = pa.array([["b", "c", "d"], ["x"], ["y"], ["r", "s"]], pa.list_(pa.string()))
    got = batch_jaccard(left, right)
    want = [
        jaccard_py(l, r) for l, r in zip(left.to_pylist(), right.to_pylist())
    ]
    assert np.allclose(got, want)


def test_levenshtein_py():
    assert levenshtein_py("kitten", "sitting") == 3
    assert levenshtein_py("", "abc") == 3
    assert levenshtein_py("abc", "abc") == 0


def test_jaro_winkler_known_values():
    assert jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler_py("", "") == 1.0
    assert jaro_winkler_py("abc", "") == 0.0


def test_duckdb_kernel_matches_python():
    kern = StringSimKernel()
    a = ["martha", "kitten", "same", ""]
    b = ["marhta", "sitting", "same", ""]
    jw, lev = kern(pa.array(a), pa.array(b))
    for i in range(len(a)):
        assert jw[i] == pytest.approx(jaro_winkler_py(a[i].upper(), b[i].upper()) if False else jaro_winkler_py(a[i], b[i]), abs=1e-6)
        m = max(len(a[i]), len(b[i]))
        want = 1.0 if m == 0 else 1.0 - levenshtein_py(a[i], b[i]) / m
        assert lev[i] == pytest.approx(want, abs=1e-9)


def test_tfidf_cosine_identical_and_disjoint():
    l = pa.array([["a", "b"], ["a", "b"]], pa.list_(pa.string()))
    r = pa.array([["a", "b"], ["c", "d"]], pa.list_(pa.string()))
    got = batch_tfidf_cosine(l, r)
    assert got[0] == pytest.approx(1.0)
    assert got[1] == 0.0


def test_vectorized_kernels_match_py_on_random_ragged_batches():
    # The sort+bincount kernels must agree with the per-pair python
    # reference on arbitrary ragged layouts incl. empty rows and repeats.
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(40)]
    lefts, rights = [], []
    for _ in range(200):
        nl, nr = rng.integers(0, 12, 2)
        lefts.append(list(rng.choice(vocab, nl)))
        rights.append(list(rng.choice(vocab, nr)))
    l = pa.array(lefts, pa.list_(pa.string()))
    r = pa.array(rights, pa.list_(pa.string()))
    got = batch_jaccard(l, r)
    want = [jaccard_py(a, b) for a, b in zip(lefts, rights)]
    assert np.allclose(got, want)

    got_cos = batch_tfidf_cosine(l, r)

    def cos_py(a, b):
        from collections import Counter
        ca, cb = Counter(a), Counter(b)
        dot = sum(ca[t] * cb[t] for t in ca)
        na = sum(v * v for v in ca.values()) ** 0.5
        nb = sum(v * v for v in cb.values()) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    want_cos = [cos_py(a, b) for a, b in zip(lefts, rights)]
    assert np.allclose(got_cos, want_cos)


def test_simhash_empty_and_layout():
    docs = [["a", "b", "a"], [], ["z"]]
    h = simhash(pa.array(docs, pa.list_(pa.string())))
    solo = simhash(pa.array([docs[0]], pa.list_(pa.string())))
    assert h[0] == solo[0]
    assert h[1] == 0
    assert h[2] != 0


def test_minhash_similarity_estimates_jaccard():
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(200)]
    a = vocab[:100]
    b = vocab[50:150]  # true J = 50/150
    arr = pa.array([a, b], pa.list_(pa.string()))
    sig = minhash_signatures(arr, num_perm=256)
    est = float(np.mean(sig[0] == sig[1]))
    assert abs(est - 1 / 3) < 0.1


def test_minhash_empty_docs_layout_invariant():
    # Regression: a trailing empty doc used to truncate the preceding doc's
    # reduceat segment (signature missed its last token), making signatures
    # depend on batch layout.
    docs = [["a", "b", "c"], []]
    sig = minhash_signatures(pa.array(docs, pa.list_(pa.string())), num_perm=32)
    ref = minhash_signatures(pa.array(docs[:1], pa.list_(pa.string())), num_perm=32)
    assert (sig[0] == ref[0]).all()
    assert (sig[1] == np.uint64((1 << 61) - 1)).all()
    # empty docs in the middle, at the start, and consecutive
    docs2 = [[], ["a", "b", "c"], [], [], ["x", "y"], []]
    sig2 = minhash_signatures(pa.array(docs2, pa.list_(pa.string())), num_perm=32)
    solo = minhash_signatures(
        pa.array([["a", "b", "c"], ["x", "y"]], pa.list_(pa.string())), num_perm=32)
    assert (sig2[1] == solo[0]).all()
    assert (sig2[4] == solo[1]).all()


def test_lsh_band_keys_shared_for_identical():
    arr = pa.array([["a", "b", "c"], ["a", "b", "c"], ["x", "y", "z"]],
                   pa.list_(pa.string()))
    sig = minhash_signatures(arr, num_perm=16)
    keys = lsh_band_keys(sig, num_bands=4)  # (n, bands) uint64 matrix
    assert (keys[0] == keys[1]).all()
    assert set(keys[0].tolist()).isdisjoint(keys[2].tolist())
    assert keys.shape == (3, 4)


def test_simhash_near_duplicates_close():
    base = [f"w{i}" for i in range(64)]
    pert = base[:60] + ["q1", "q2", "q3", "q4"]
    other = [f"z{i}" for i in range(64)]
    arr = pa.array([base, pert, other], pa.list_(pa.string()))
    h = simhash(arr)
    d_near = hamming64(h[:1], h[1:2])[0]
    d_far = hamming64(h[:1], h[2:3])[0]
    assert d_near < d_far


def test_tokenize_cjk_char_segmentation():
    from ember_ray.functions.text import tokenize_array, tokenize_array_cjk

    arr = pa.array(["运动鞋 new style", "hello world", "女鞋123"])
    toks = tokenize_array_cjk(arr).to_pylist()
    # CJK runs → one token per char; latin words unchanged
    assert toks[0] == ["运", "动", "鞋", "new", "style"]
    assert toks[1] == ["hello", "world"]
    assert toks[2] == ["女", "鞋", "123"]
    # plain tokenizer keeps whole CJK runs (the gap this variant closes)
    assert tokenize_array(arr).to_pylist()[0] == ["运动鞋", "new", "style"]


def test_detokenize_and_paths():
    from ember_ray.functions.text import detokenize, format_paths

    toks = pa.array([["a", "b"], [], ["x"]], pa.list_(pa.string()))
    assert detokenize(toks).to_pylist() == ["a b", "", "x"]
    ids = pa.array([0, 17, 5], pa.int64())
    assert format_paths(ids).to_pylist() == ["0/0.bin", "1/17.bin", "5/5.bin"]


def test_char_shingles():
    out = char_shingles(pa.array(["abcdef", ""]), k=3).to_pylist()
    assert out[0] == ["abc", "bcd", "cde", "def"]
    assert out[1] == []


def test_stable_hash_is_deterministic():
    a = stable_hash64(["x", "y"])
    b = stable_hash64(["x", "y"])
    assert (a == b).all()
    assert a[0] != a[1]


def test_canonical_pairs():
    lo, hi = canonical_pairs(np.array(["b", "a", "c"]), np.array(["a", "b", "c"]))
    assert list(lo) == ["a", "a"] and list(hi) == ["b", "b"]


def test_char_shingle_hashes_matches_reference():
    import numpy as np

    from ember_ray.functions.minhash import char_shingle_hashes

    texts = pa.array(["abcdefgh", "ab", "", "abcdefgh", "xbcdefgh"])
    h, offs = char_shingle_hashes(texts, k=5)
    counts = np.diff(offs)
    # lengths mirror char_shingles: L-k+1 for long rows, 1 short, 0 empty
    assert counts.tolist() == [4, 1, 0, 4, 4]
    # identical strings → identical shingle ids
    assert (h[offs[0]:offs[1]] == h[offs[3]:offs[4]]).all()
    # one-char difference → exactly the first window differs
    a = h[offs[0]:offs[1]]
    b = h[offs[4]:offs[5]]
    assert a[0] != b[0] and (a[1:] == b[1:]).all()
    # windows never straddle rows: the split column has only the two
    # whole-row windows; the joined string additionally has straddlers
    h2, _ = char_shingle_hashes(pa.array(["abcde", "fghij"]), k=5)
    h3, _ = char_shingle_hashes(pa.array(["abcdefghij"]), k=5)
    assert len(h2) == 2 and len(h3) == 6
    assert h2[0] == h3[0] and h2[1] == h3[5]  # same content, same id
    assert h3[2] not in set(h2.tolist())      # straddler "cdefg" absent


def test_batch_jaccard_sorted_sets_matches_exact():
    """The presorted-set kernel must be value-identical to the exact-width
    multiset path on the same underlying token lists."""
    import numpy as np
    import pyarrow as pa

    from ember_ray.functions.similarity import (batch_jaccard_hashes,
                                                batch_jaccard_sorted_sets)
    from ember_ray.pipelines.dedup import _sorted_unique_lists

    rng = np.random.default_rng(3)
    rows_l, rows_r = [], []
    for _ in range(300):
        rows_l.append(rng.integers(0, 40, size=rng.integers(0, 60)))
        rows_r.append(rng.integers(0, 40, size=rng.integers(0, 60)))

    def pack(rows):
        flat = np.concatenate([r for r in rows]) if rows else np.empty(0)
        h = (flat.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        off = np.concatenate([[0], np.cumsum([len(r) for r in rows])])
        return h, off.astype(np.int64)

    lh, lo = pack(rows_l)
    rh, ro = pack(rows_r)
    want = batch_jaccard_hashes(lh, lo, rh, ro, exact=True)

    ul = _sorted_unique_lists(lh, lo)
    ur = _sorted_unique_lists(rh, ro)
    got = batch_jaccard_sorted_sets(
        np.asarray(ul.values, np.uint64), np.asarray(ul.offsets, np.int64),
        np.asarray(ur.values, np.uint64), np.asarray(ur.offsets, np.int64))
    assert (got == want).all()
