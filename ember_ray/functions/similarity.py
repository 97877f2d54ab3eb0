"""Pairwise similarity kernels (reference T2-analog scorers + F1 fn).

Semantics reproduced from the reference:
  * token-set Jaccard — ``len(s1 & s2) / len(s1 | s2)``
    (``scripts/construction/build_ali_dataset.py:44-47``).
  * pairwise match scoring in [0,1] with a threshold (analog of the BERT
    matcher's positive-class probability, ``src/models/matcher.py:31-37``)
    — here a weighted blend of Jaccard / Jaro-Winkler / Levenshtein-ratio /
    TF-IDF-cosine per BASELINE.json north_star.

Batch kernels run inside scorer actors over Arrow batches. The hot path
uses DuckDB's C++ ``jaro_winkler_similarity`` / ``levenshtein`` scalar
functions zero-copy over Arrow (one SQL call per batch — vectorized, no
Python row loop); pure-Python references below are the test oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_SIM_CHARS = 128  # cap edit-distance inputs: O(n·m) DP on full transcripts
                     # would dominate (~1 ms/pair at 512 chars, measured).
                     # Separation is insensitive to the cap on transcript
                     # text (pos_p1 0.710@128 vs 0.719@512, neg_p99 ~0.666
                     # at both on the 6k-cluster synthetic corpus) while
                     # cost drops 3.6×; analog of the reference's
                     # max_length=256-token truncation (configs/ali_tm.yaml:9).


# ---------------------------------------------------------------- references

def jaccard_py(s1, s2) -> float:
    """Reference semantics: build_ali_dataset.py:44-47."""
    a, b = set(s1), set(s2)
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def levenshtein_py(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def jaro_py(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3


def jaro_winkler_py(a: str, b: str, p: float = 0.1) -> float:
    j = jaro_py(a, b)
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * p * (1 - j)


# ------------------------------------------------------------- batch kernels

class StringSimKernel:
    """Per-actor DuckDB connection computing JW + Levenshtein-ratio over an
    Arrow batch in one vectorized SQL call. Falls back to pure Python if
    DuckDB is unavailable. Construct once per actor (__init__ state, T1/T2
    pattern)."""

    def __init__(self, max_chars: int = MAX_SIM_CHARS):
        self.max_chars = max_chars
        try:
            import duckdb

            self.con = duckdb.connect()
            # the enclosing actor owns num_cpus=1; duckdb defaults to ALL
            # machine cores, which oversubscribes the node as the actor
            # pool widens (N actors × all-cores threads) and flatlines
            # scaling. One thread per actor; parallelism comes from the pool.
            self.con.execute("SET threads = 1")
        except Exception:  # pragma: no cover
            self.con = None

    def __call__(self, left: pa.Array, right: pa.Array):
        """→ (jaro_winkler: float64 ndarray, levenshtein_ratio: float64 ndarray)."""
        import pyarrow.compute as pc

        lt = pc.utf8_slice_codeunits(left, 0, self.max_chars)
        rt = pc.utf8_slice_codeunits(right, 0, self.max_chars)
        if self.con is not None:
            batch = pa.table({"a": lt, "b": rt})
            out = self.con.execute(
                "SELECT jaro_winkler_similarity(a, b) AS jw,"
                " CASE WHEN greatest(length(a), length(b)) = 0 THEN 1.0"
                "      ELSE 1.0 - levenshtein(a, b)::DOUBLE /"
                "           greatest(length(a), length(b)) END AS lev"
                " FROM batch"
            ).arrow()
            jw = np.asarray(out["jw"].combine_chunks(), dtype=np.float64)
            lev = np.asarray(out["lev"].combine_chunks(), dtype=np.float64)
            # duckdb scores ("","") as 0; engine semantics: equal strings → 1.0
            eq = np.asarray(pc.equal(lt, rt))
            jw = np.where(eq, 1.0, jw)  # (arrays from duckdb are read-only)
            return jw, lev
        a_list = lt.to_pylist()
        b_list = rt.to_pylist()
        jw = np.fromiter(
            (jaro_winkler_py(a or "", b or "") for a, b in zip(a_list, b_list)),
            np.float64,
            len(a_list),
        )
        lev = np.fromiter(
            (
                1.0
                if max(len(a or ""), len(b or "")) == 0
                else 1.0 - levenshtein_py(a or "", b or "") / max(len(a or ""), len(b or ""))
                for a, b in zip(a_list, b_list)
            ),
            np.float64,
            len(a_list),
        )
        return jw, lev


_ROW_BITS = np.uint64(43)  # packed key layout: row << 43 | (hash >> 21)
_HASH_MASK = np.uint64((1 << 43) - 1)
_CHUNK_ROWS = 1 << 20      # rows per packed chunk (row id must fit 21 bits)


def _packed_unique(h: np.ndarray, offsets: np.ndarray):
    """Per-row unique elements via ONE single-key sort of packed
    ``row<<43 | hash>>21`` uint64 keys — measured ~10× faster than the
    two-key ``np.lexsort`` on scorer-sized batches.

    The 43-bit hash truncation can only merge two distinct tokens of the
    SAME row (probability ≈ k²/2^44 per row — negligible, and
    deterministic across runs/workers since the underlying hash is).

    Returns ``(pk, tf, first_idx)``: sorted packed keys of the unique
    (row, hash) groups, each group's within-row count, and an index into
    the original flat array for resolving per-token metadata (e.g. IDF).
    Rows are recovered as ``pk >> 43``. Caller must have < 2^21 rows
    (see ``_CHUNK_ROWS`` chunking in the public kernels).
    """
    n = len(offsets) - 1
    assert n < (1 << 21), "row count exceeds packing budget — chunk the call"
    counts = np.diff(offsets)
    row = np.repeat(np.arange(n, dtype=np.uint64), counts)
    if len(h) == 0:
        z = np.empty(0, np.int64)
        return np.empty(0, np.uint64), z, z
    key = (row << _ROW_BITS) | (h >> np.uint64(21))
    order = np.argsort(key)
    ks = key[order]
    new = np.empty(len(ks), bool)
    new[0] = True
    new[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(new)
    tf = np.diff(np.append(starts, len(ks)))
    return ks[starts], tf, order[starts]


def _exact_unique(h: np.ndarray, offsets: np.ndarray):
    """Per-row unique elements at FULL 64-bit hash width → (rows, hashes),
    sorted by (row, hash), one entry per unique (row, hash) group.

    Two fast single-key sorts (hash, then stable row) instead of
    ``np.lexsort`` (~10× slower, CLAUDE.md): a stable sort by row of the
    hash-sorted order yields the exact (row, hash) order. Used by
    ORACLE-GATED verify kernels where the 43-bit packed truncation's
    collision odds (~k²/2^44 per row) would become statistically expected
    over millions of candidate pairs (ADVICE r2); the scorer keeps the
    packed path and documents its budget.
    """
    n = len(offsets) - 1
    counts = np.diff(offsets)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    if len(h) == 0:
        z = np.empty(0, np.int64)
        return z, np.empty(0, np.uint64)
    o1 = np.argsort(h, kind="stable")
    o2 = np.argsort(row[o1], kind="stable")
    order = o1[o2]
    rs, hs = row[order], h[order]
    new = np.empty(len(hs), bool)
    new[0] = True
    new[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    starts = np.flatnonzero(new)
    return rs[starts], hs[starts]


def _jaccard_from_exact(ra, ha, rb, hb, n: int) -> np.ndarray:
    """|A∩B| / |A∪B| per row from two sides' exact (row, hash) uniques."""
    ua = np.bincount(ra, minlength=n)
    ub = np.bincount(rb, minlength=n)
    rows = np.concatenate([ra, rb])
    hashes = np.concatenate([ha, hb])
    if len(rows):
        o1 = np.argsort(hashes, kind="stable")
        o2 = np.argsort(rows[o1], kind="stable")
        order = o1[o2]
        rs, hs = rows[order], hashes[order]
        eq = (rs[1:] == rs[:-1]) & (hs[1:] == hs[:-1])
        inter = np.bincount(rs[1:][eq], minlength=n)
    else:
        inter = np.zeros(n, np.int64)
    denom = ua + ub - inter
    out = np.zeros(n, np.float64)
    nz = denom > 0
    out[nz] = inter[nz] / denom[nz]
    return out


def _jaccard_from_packed(pka: np.ndarray, pkb: np.ndarray, n: int) -> np.ndarray:
    """|A∩B| / |A∪B| per row from two sides' sorted packed-unique keys.
    An element shared by both sides appears exactly twice in the merged
    sorted sequence (each side is unique per row)."""
    ua = np.bincount((pka >> _ROW_BITS).astype(np.int64), minlength=n)
    ub = np.bincount((pkb >> _ROW_BITS).astype(np.int64), minlength=n)
    merged = np.sort(np.concatenate([pka, pkb]))
    if len(merged):
        eq = merged[1:] == merged[:-1]
        inter = np.bincount(
            (merged[1:][eq] >> _ROW_BITS).astype(np.int64), minlength=n)
    else:
        inter = np.zeros(n, np.int64)
    denom = ua + ub - inter
    out = np.zeros(n, np.float64)
    nz = denom > 0
    out[nz] = inter[nz] / denom[nz]
    return out


def _cosine_from_packed(pka, va, pkb, vb, n: int) -> np.ndarray:
    """Weighted cosine per row from packed-unique keys + per-group values."""
    na2 = np.bincount((pka >> _ROW_BITS).astype(np.int64), weights=va * va,
                      minlength=n)
    nb2 = np.bincount((pkb >> _ROW_BITS).astype(np.int64), weights=vb * vb,
                      minlength=n)
    keys = np.concatenate([pka, pkb])
    vals = np.concatenate([va, vb])
    dot = np.zeros(n, np.float64)
    if len(keys):
        order = np.argsort(keys)
        ks, vs = keys[order], vals[order]
        eq = ks[1:] == ks[:-1]
        dot = np.bincount(
            (ks[1:][eq] >> _ROW_BITS).astype(np.int64),
            weights=vs[1:][eq] * vs[:-1][eq], minlength=n)
    norm = np.sqrt(na2 * nb2)
    out = np.zeros(n, np.float64)
    nz = norm > 0
    out[nz] = dot[nz] / norm[nz]
    return out


def batch_jaccard_hashes(lh: np.ndarray, lo: np.ndarray,
                         rh: np.ndarray, ro: np.ndarray,
                         exact: bool = True) -> np.ndarray:
    """Set Jaccard per pair over pre-hashed element ids + offsets.
    Fully vectorized, no per-pair loop.

    ``exact=True`` (default — all oracle-gated verify stages): full
    64-bit hash width via two single-key sorts per side. ``exact=False``:
    the packed 43-bit single-sort path (~2× fewer sorts; collision odds
    ~k²/2^44 per row — fine for scorer-style ranking, not for bitwise
    oracle comparison at corpus scale)."""
    lo = np.asarray(lo, np.int64)
    ro = np.asarray(ro, np.int64)
    n = len(lo) - 1
    if exact:
        ra, ha = _exact_unique(lh[lo[0]:lo[n]], lo - lo[0])
        rb, hb = _exact_unique(rh[ro[0]:ro[n]], ro - ro[0])
        return _jaccard_from_exact(ra, ha, rb, hb, n)
    out = np.empty(n, np.float64)
    for s in range(0, max(n, 1), _CHUNK_ROWS):
        e = min(n, s + _CHUNK_ROWS)
        if e <= s:
            break
        pka, _, _ = _packed_unique(lh[lo[s]:lo[e]], lo[s:e + 1] - lo[s])
        pkb, _, _ = _packed_unique(rh[ro[s]:ro[e]], ro[s:e + 1] - ro[s])
        out[s:e] = _jaccard_from_packed(pka, pkb, e - s)
    return out


def batch_jaccard_sorted_sets(lh: np.ndarray, lo: np.ndarray,
                              rh: np.ndarray, ro: np.ndarray) -> np.ndarray:
    """Exact full-width set Jaccard per pair over PRESORTED-UNIQUE per-row
    hash lists (e.g. the dedup pipelines' ``th`` columns): the four
    per-side argsorts of ``_exact_unique`` vanish — only the cross-side
    merge (two stable single-key argsorts) remains. Value-identical to
    ``batch_jaccard_hashes(exact=True)`` on the same multisets."""
    lo = np.asarray(lo, np.int64)
    ro = np.asarray(ro, np.int64)
    n = len(lo) - 1
    if n <= 0:
        return np.empty(0, np.float64)
    ua = np.diff(lo)
    ub = np.diff(ro)
    rows = np.concatenate([
        np.repeat(np.arange(n, dtype=np.int64), ua),
        np.repeat(np.arange(n, dtype=np.int64), ub),
    ])
    hashes = np.concatenate([lh[lo[0]:lo[n]], rh[ro[0]:ro[n]]])
    if len(hashes):
        o1 = np.argsort(hashes, kind="stable")
        o2 = np.argsort(rows[o1], kind="stable")
        order = o1[o2]
        rs, hs = rows[order], hashes[order]
        eq = (rs[1:] == rs[:-1]) & (hs[1:] == hs[:-1])
        inter = np.bincount(rs[1:][eq], minlength=n)
    else:
        inter = np.zeros(n, np.int64)
    denom = ua + ub - inter
    out = np.zeros(n, np.float64)
    nz = denom > 0
    out[nz] = inter[nz] / denom[nz]
    return out


def batch_jaccard(left_tokens: pa.Array, right_tokens: pa.Array) -> np.ndarray:
    """Vectorized-ish token-set Jaccard over list<string> pair columns.

    Hashes tokens to uint64 once per batch (vectorized), then per pair
    intersects sorted unique id arrays with numpy — no Python string ops
    in the loop.
    """
    from ..util import stable_hash64

    def ids_per_row(lst: pa.Array):
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        flat = lst.values
        h = stable_hash64(flat) if len(flat) else np.empty(0, np.uint64)
        offsets = np.asarray(lst.offsets)
        return h, offsets

    lh, lo = ids_per_row(left_tokens)
    rh, ro = ids_per_row(right_tokens)
    return batch_jaccard_hashes(lh, lo, rh, ro)


def idf_weights(ids: np.ndarray, idf) -> np.ndarray:
    """Vectorized IDF lookup: ``idf = (tid_sorted, values)`` from
    ``build_idf``; ids absent from the table get weight 1.0 (hashing-trick
    default)."""
    w = np.ones(len(ids), np.float64)
    if idf is None or len(ids) == 0:
        return w
    tid, vals = idf
    if len(tid) == 0:
        return w
    pos = np.searchsorted(tid, ids)
    pos_c = np.clip(pos, 0, len(tid) - 1)
    hit = tid[pos_c] == ids
    w[hit] = vals[pos_c[hit]]
    return w


def batch_tfidf_cosine(
    left_tokens: pa.Array,
    right_tokens: pa.Array,
    idf=None,
    num_features: int = 1 << 20,
) -> np.ndarray:
    """TF-IDF cosine over token-list pairs using the hashing trick.

    ``idf`` is the ``(tid_sorted, values)`` pair from ``build_idf`` (numpy,
    broadcast zero-copy via ray.put — reference T5 pattern: shared fastText
    vocab/embeddings, scripts/dm.py:286-299); weights resolve for the whole
    batch in one vectorized ``searchsorted``, never per-token python gets.
    """
    _, cos = token_pair_scores(left_tokens, right_tokens, idf, num_features)
    return cos


def token_pair_scores(
    left_tokens: pa.Array,
    right_tokens: pa.Array,
    idf=None,
    num_features: int = 1 << 20,
):
    """Fused (jaccard, tfidf_cosine) over token-list pair columns.

    One hash pass + one packed-unique sort PER SIDE feeds both metrics —
    the scorer's two token kernels used to each re-hash and re-sort the
    same lists. Dedup/intersection runs in the 43-bit packed space;
    IDF weights resolve from each unique group's representative full hash
    (mod ``num_features`` — the hashing trick, vectorized searchsorted).
    """
    from .minhash import token_hashes

    lh, lo = token_hashes(left_tokens)
    rh, ro = token_hashes(right_tokens)
    lo = np.asarray(lo, np.int64)
    ro = np.asarray(ro, np.int64)
    n = len(lo) - 1
    jac = np.empty(n, np.float64)
    cos = np.empty(n, np.float64)
    for s in range(0, max(n, 1), _CHUNK_ROWS):
        e = min(n, s + _CHUNK_ROWS)
        if e <= s:
            break
        hl = lh[lo[s]:lo[e]]
        hr = rh[ro[s]:ro[e]]
        pka, tfa, fa = _packed_unique(hl, lo[s:e + 1] - lo[s])
        pkb, tfb, fb = _packed_unique(hr, ro[s:e + 1] - ro[s])
        jac[s:e] = _jaccard_from_packed(pka, pkb, e - s)
        ida = (hl[fa] % np.uint64(num_features)).astype(np.int64)
        idb = (hr[fb] % np.uint64(num_features)).astype(np.int64)
        av = tfa * idf_weights(ida, idf)
        bv = tfb * idf_weights(idb, idf)
        cos[s:e] = _cosine_from_packed(pka, av, pkb, bv, e - s)
    return jac, cos


def _packed_from_sorted_unique(h: np.ndarray, offsets: np.ndarray,
                               tf: np.ndarray):
    """Presorted-unique per-row hashes → (packed keys, merged tf, rep idx).

    Equivalent to ``_packed_unique`` on the expanded multiset but with NO
    sort: the rows are ascending by construction and hashes ascending
    within each row, so ``row<<43 | hash>>21`` is already globally sorted.
    Distinct full hashes that collide in the 43-bit packed space (adjacent
    after packing) merge with their tf summed — the same behavior
    ``_packed_unique`` has."""
    n = len(offsets) - 1
    counts = np.diff(offsets)
    row = np.repeat(np.arange(n, dtype=np.uint64), counts)
    pk = (row << _ROW_BITS) | (h >> np.uint64(21))
    if len(pk) == 0:
        return pk, tf.astype(np.float64), np.empty(0, np.int64)
    eq = pk[1:] == pk[:-1]
    if not eq.any():
        return pk, tf.astype(np.float64), np.arange(len(pk))
    starts = np.flatnonzero(np.r_[True, ~eq])
    tfm = np.add.reduceat(tf.astype(np.float64), starts)
    return pk[starts], tfm, starts


def _jaccard_cosine_from_packed(pka, va, pkb, vb, n: int):
    """Fused (jaccard, cosine) from per-side sorted-unique packed keys:
    ONE argsort of the concatenated keys serves both the intersection
    count and the dot product (``_jaccard_from_packed`` +
    ``_cosine_from_packed`` each sorted the same concat — this halves the
    merge sorts). Value-identical to calling both."""
    ra = (pka >> _ROW_BITS).astype(np.int64)
    rb = (pkb >> _ROW_BITS).astype(np.int64)
    ua = np.bincount(ra, minlength=n)
    ub = np.bincount(rb, minlength=n)
    na2 = np.bincount(ra, weights=va * va, minlength=n)
    nb2 = np.bincount(rb, weights=vb * vb, minlength=n)
    keys = np.concatenate([pka, pkb])
    vals = np.concatenate([va, vb])
    inter = np.zeros(n, np.int64)
    dot = np.zeros(n, np.float64)
    if len(keys):
        order = np.argsort(keys)
        ks, vs = keys[order], vals[order]
        eq = ks[1:] == ks[:-1]
        rows_eq = (ks[1:][eq] >> _ROW_BITS).astype(np.int64)
        inter = np.bincount(rows_eq, minlength=n)
        dot = np.bincount(rows_eq, weights=vs[1:][eq] * vs[:-1][eq],
                          minlength=n)
    denom = ua + ub - inter
    jac = np.zeros(n, np.float64)
    nz = denom > 0
    jac[nz] = inter[nz] / denom[nz]
    norm = np.sqrt(na2 * nb2)
    cos = np.zeros(n, np.float64)
    nz = norm > 0
    cos[nz] = dot[nz] / norm[nz]
    return jac, cos


def token_pair_scores_prehashed(
    lh: np.ndarray, lo: np.ndarray, ltf: np.ndarray,
    rh: np.ndarray, ro: np.ndarray, rtf: np.ndarray,
    idf=None,
    num_features: int = 1 << 20,
):
    """``token_pair_scores`` over PRECOMPUTED per-row sorted-unique token
    hashes + term frequencies (the ``thash``/``ttf`` columns built once per
    conversation at assembly): no tokenize, no hashing, and no per-side
    packed-unique sorts — only the cross-side merges remain. Produces
    bitwise-identical (jaccard, tfidf_cosine) to the string path given the
    same token multisets (same 43-bit packed space, same hashing-trick IDF
    ids)."""
    lo = np.asarray(lo, np.int64)
    ro = np.asarray(ro, np.int64)
    n = len(lo) - 1
    jac = np.empty(n, np.float64)
    cos = np.empty(n, np.float64)
    for s in range(0, max(n, 1), _CHUNK_ROWS):
        e = min(n, s + _CHUNK_ROWS)
        if e <= s:
            break
        hl = lh[lo[s]:lo[e]]
        hr = rh[ro[s]:ro[e]]
        pka, tfa, fa = _packed_from_sorted_unique(
            hl, lo[s:e + 1] - lo[s], ltf[lo[s]:lo[e]])
        pkb, tfb, fb = _packed_from_sorted_unique(
            hr, ro[s:e + 1] - ro[s], rtf[ro[s]:ro[e]])
        ida = (hl[fa] % np.uint64(num_features)).astype(np.int64)
        idb = (hr[fb] % np.uint64(num_features)).astype(np.int64)
        av = tfa * idf_weights(ida, idf)
        bv = tfb * idf_weights(idb, idf)
        jac[s:e], cos[s:e] = _jaccard_cosine_from_packed(
            pka, av, pkb, bv, e - s)
    return jac, cos


def encode_tokens_to_string(tokens: pa.Array, alphabet: int = 1 << 14,
                            base: int = 0x4E00):
    """Encode each token as ONE unicode codepoint (hash % alphabet + base,
    inside the CJK block, below the surrogate range) so sequence-edit
    kernels run over ~n-token strings instead of ~n-char strings.

    Levenshtein/Jaro-Winkler cost O(len_a·len_b): on full transcript text
    capped at 512 chars that is ~1 ms/pair (measured; the scorer's
    dominant cost); on token codes (~100/conv) it is ~25× cheaper AND the
    distance becomes token-level edit distance — the natural unit for
    transcripts, like the reference's token-based matcher inputs
    (configs/ali_tm.yaml:9 max_length=256 TOKENS, not chars).

    Hash collisions (1/16384 per token pair) only ever make two different
    tokens compare equal — a sub-percent perturbation, deterministic
    across runs/cluster sizes (stable_hash64).

    Returns (encoded: list[str], as python list) aligned with the input rows.
    """
    from ..util import stable_hash64

    lst = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    flat = lst.values
    if len(flat):
        codes = (stable_hash64(flat) % np.uint64(alphabet)).astype(np.uint32)
        codes += np.uint32(base)
        all_chars = "".join(map(chr, codes.tolist()))
    else:
        all_chars = ""
    offsets = np.asarray(lst.offsets)
    return pa.array(
        [all_chars[offsets[i]:offsets[i + 1]] for i in range(len(offsets) - 1)],
        pa.string(),
    )
