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


def batch_jaccard_hashes(lh: np.ndarray, lo: np.ndarray,
                         rh: np.ndarray, ro: np.ndarray) -> np.ndarray:
    """Set Jaccard per pair over pre-hashed element ids + offsets.

    Fully vectorized (no per-pair loop): one ``row_unique_groups`` pass per
    side dedups within rows, then one merged lexsort finds intersections as
    adjacent (row, hash) duplicates — each side is already unique per row,
    so an adjacent equal pair is exactly one intersection element.
    """
    from .minhash import row_unique_groups

    n = len(lo) - 1
    ra, ha, _, _ = row_unique_groups(lh, lo)
    rb, hb, _, _ = row_unique_groups(rh, ro)
    ua = np.bincount(ra, minlength=n)
    ub = np.bincount(rb, minlength=n)
    rows = np.concatenate([ra, rb])
    hashes = np.concatenate([ha, hb])
    if len(rows):
        order = np.lexsort((hashes, rows))
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
    from ..util import stable_hash64

    def prep(lst):
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        flat = lst.values
        h = (
            (stable_hash64(flat) % np.uint64(num_features)).astype(np.int64)
            if len(flat)
            else np.empty(0, np.int64)
        )
        return h, np.asarray(lst.offsets)

    from .minhash import row_unique_groups

    lh, lo = prep(left_tokens)
    rh, ro = prep(right_tokens)
    lw = idf_weights(lh, idf)
    rw = idf_weights(rh, idf)
    n = len(lo) - 1
    # per-row unique (token, tf) groups, one vectorized pass per side;
    # weight resolved at the group's first occurrence (IDF depends only on
    # the hashed id, identical at every occurrence)
    ra, ha, tfa, fa = row_unique_groups(lh.view(np.uint64), lo)
    rb, hb, tfb, fb = row_unique_groups(rh.view(np.uint64), ro)
    av = tfa * lw[fa]
    bv = tfb * rw[fb]
    na2 = np.bincount(ra, weights=av * av, minlength=n)
    nb2 = np.bincount(rb, weights=bv * bv, minlength=n)
    # dot product: merge both sides' groups, sort by (row, hash); an
    # adjacent equal (row, hash) pair is one shared term (sides are unique
    # within row, so at most two occurrences exist)
    rows = np.concatenate([ra, rb])
    hashes = np.concatenate([ha, hb])
    vals = np.concatenate([av, bv])
    dot = np.zeros(n, np.float64)
    if len(rows):
        order = np.lexsort((hashes, rows))
        rs, hs, vs = rows[order], hashes[order], vals[order]
        eq = (rs[1:] == rs[:-1]) & (hs[1:] == hs[:-1])
        dot = np.bincount(rs[1:][eq], weights=vs[1:][eq] * vs[:-1][eq],
                          minlength=n)
    norm = np.sqrt(na2 * nb2)
    out = np.zeros(n, np.float64)
    nz = norm > 0
    out[nz] = dot[nz] / norm[nz]
    return out


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
