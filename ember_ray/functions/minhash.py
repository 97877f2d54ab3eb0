"""MinHash / LSH / SimHash sketch kernels.

The reference has no sketches — its blocking is a top-12-similar-cluster
cross join over exact token-set profiles (``build_ali_dataset.py:36,
133-217``), which needs all cluster profiles pairwise-compared and cannot
scale. The new engine's blocking (SURVEY.md §7.1 step 3 and BASELINE.json
north_star) replaces it with MinHash-LSH band keys: Jaccard-similar
records land in the same band bucket with high probability, turning the
all-pairs comparison into a ``groupby(block_key)``.

All kernels are numpy-vectorized per document over pre-hashed tokens; no
Python string operations in loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 142):
    rng = np.random.default_rng(seed)  # fixed seed → stable family across runs
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


def token_hashes(tokens: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """list<string> column → (flat uint64 hashes, offsets)."""
    from ..util import stable_hash64

    lst = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    flat = lst.values
    h = stable_hash64(flat) if len(flat) else np.empty(0, np.uint64)
    return h, np.asarray(lst.offsets)


def row_unique_groups(h: np.ndarray, offsets: np.ndarray):
    """Per-row unique elements of a ragged uint64 array, fully vectorized.

    ``h`` is the flat element array, ``offsets`` the row boundaries
    (len n+1). Returns ``(row, uh, tf, first_idx)`` where each position is
    one (row, unique-hash) group: ``row`` the row index (sorted ascending),
    ``uh`` the element value, ``tf`` its count within the row, and
    ``first_idx`` an index into ``h``'s original order where that value
    first sorts. One lexsort + one diff — no per-row Python loop. The
    shared backbone of the vectorized Jaccard / TF-IDF / SimHash kernels.
    """
    offsets = np.asarray(offsets, np.int64)
    n = len(offsets) - 1
    counts = np.diff(offsets)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    if len(h) == 0:
        z = np.empty(0, np.int64)
        return z, np.empty(0, np.uint64), z, z
    order = np.lexsort((h, row))
    hs = h[order]
    rs = row[order]
    new = np.empty(len(hs), bool)
    new[0] = True
    new[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    starts = np.flatnonzero(new)
    tf = np.diff(np.append(starts, len(hs)))
    return rs[starts], hs[starts], tf, order[starts]


def token_hash_lists(tokens: pa.Array):
    """list<string> tokens → ``(thash, ttf)`` list columns: per-row SORTED
    UNIQUE token hashes (list<uint64>) + term frequencies (list<int32>).

    The precompute-once backbone of the hashed scorer path: tokenize+hash
    runs once per conversation at assembly instead of once per pair side
    (~5× per conv) in the scorer, and the per-side packed-unique sorts in
    the pair kernels collapse to merges over these presorted lists."""
    h, offsets = token_hashes(tokens)
    n = len(np.asarray(offsets)) - 1
    row, uh, tf, _ = row_unique_groups(h, offsets)
    cnt = np.bincount(row, minlength=n) if len(row) else np.zeros(n, np.int64)
    off = pa.array(np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32),
                   pa.int32())
    thash = pa.ListArray.from_arrays(off, pa.array(uh, pa.uint64()))
    ttf = pa.ListArray.from_arrays(off, pa.array(tf.astype(np.int32),
                                                 pa.int32()))
    return thash, ttf


def hash_list_arrays(col, dtype=np.uint64) -> tuple[np.ndarray, np.ndarray]:
    """list<numeric> column → (flat values as ``dtype``, int64 offsets)."""
    lst = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return (np.asarray(lst.values, dtype=dtype) if len(lst.values)
            else np.empty(0, dtype)), np.asarray(lst.offsets, np.int64)


def minhash_signatures(
    tokens: pa.Array, num_perm: int = 64, seed: int = 142
) -> np.ndarray:
    """→ (n_docs, num_perm) uint64 signature matrix.

    sig[i] = min over the doc's token hashes h of (a_i·h + b_i) mod 2^61−1.
    Empty docs get the max-hash sentinel signature.

    Fully vectorized: one (num_perm × tokens) multiply-add per chunk and a
    ``np.minimum.reduceat`` over document offsets — no per-doc Python loop.
    Chunked so the permutation matrix stays ≲64 MB.
    """
    # overflow-free (mod 2^64) multiply-add is fine: we only need a fixed
    # deterministic permutation family, not number-theoretic guarantees
    h, offsets = token_hashes(tokens)
    return _minhash_from_hashes(h, offsets, num_perm, seed)


_BAND_SALT = np.uint64(0x9E3779B97F4A7C15)


def lsh_band_keys(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """Signature matrix → (n_docs, num_bands) uint64 band-key matrix.

    num_perm must divide into num_bands equal rows-per-band; two docs share
    a band key iff their signatures agree on that band's rows. Keys are
    uint64 (band index mixed in, so keys from different bands never
    collide) — 8 bytes through the shuffle instead of a 21-char string,
    and no per-key Python string formatting.
    """
    n, num_perm = sig.shape
    assert num_perm % num_bands == 0, "num_perm must be divisible by num_bands"
    r = num_perm // num_bands
    out = np.empty((n, num_bands), np.uint64)
    for band in range(num_bands):
        chunk = sig[:, band * r:(band + 1) * r]
        mix = np.full(n, np.uint64(band + 1), np.uint64)
        for j in range(r):
            mix = (mix ^ chunk[:, j]) * _BAND_SALT
        out[:, band] = mix
    return out


def simhash(tokens: pa.Array, seed: int = 142) -> np.ndarray:
    """64-bit SimHash per doc: sign of tf-weighted bit sums of token hashes.

    Vectorized across the whole batch: one ``row_unique_groups`` pass for
    per-doc (token, tf) groups, one (groups × 64) bit expansion, one
    ``np.add.reduceat`` over doc boundaries — no per-doc Python loop."""
    h, offsets = token_hashes(tokens)
    n = len(offsets) - 1
    out = np.zeros(n, np.uint64)
    rows, uh, tf, _ = row_unique_groups(h, offsets)
    if not len(rows):
        return out
    bits = np.arange(64, dtype=np.uint64)
    bitmat = ((uh[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
    contrib = (bitmat * 2 - 1) * tf[:, None]
    starts = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
    acc = np.add.reduceat(contrib, starts, axis=0)  # (docs-present, 64)
    fp = ((acc > 0).astype(np.uint64) << bits[None, :]).sum(axis=1)
    out[rows[starts]] = fp.astype(np.uint64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = a ^ b
    cnt = np.zeros(len(x), np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def char_shingles(texts: pa.Array, k: int = 5) -> pa.Array:
    """string column → list<string> of char k-grams (for near-dup MinHash)."""
    import pyarrow.compute as pc

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    py = arr.to_pylist()
    return pa.array(
        [
            [s[i:i + k] for i in range(max(1, len(s) - k + 1))] if s else []
            for s in py
        ],
        pa.list_(pa.string()),
    )


def _minhash_from_hashes(h: np.ndarray, offsets: np.ndarray, num_perm: int,
                         seed: int, chunk_tok: int = 16384) -> np.ndarray:
    """Core MinHash over pre-hashed elements (see minhash_signatures).

    One preallocated ``(num_perm × chunk_tok)`` buffer is reused across
    chunks with in-place multiply/add/mask — measured 3× faster warm and
    ~12× faster on a cold worker than the naive ``(a*h+b)&M`` expression,
    whose three ~70 MB temporaries dominated the blocking stage's task
    time (page-fault cost re-paid by every fresh Ray worker)."""
    a, b = _perm_params(num_perm, seed)
    n = len(offsets) - 1
    sig = np.full((n, num_perm), _MAX_HASH, dtype=np.uint64)
    if not len(h):
        return sig
    doc_starts = offsets[:-1]
    doc_ends = offsets[1:]
    m = np.empty((num_perm, chunk_tok), np.uint64)
    i = 0
    while i < n:
        j = i
        while j < n and doc_ends[j] - doc_starts[i] <= chunk_tok:
            j += 1
        j = max(j, i + 1)
        lo, hi = doc_starts[i], doc_ends[j - 1]
        if hi > lo:
            w = hi - lo
            hh = h[lo:hi]
            mm = m[:, :w] if w <= chunk_tok else np.empty((num_perm, w), np.uint64)
            np.multiply(a[:, None], hh[None, :], out=mm)
            np.add(mm, b[:, None], out=mm)
            np.bitwise_and(mm, _MERSENNE, out=mm)
            # reduceat offsets for NONEMPTY docs only: empty docs contribute
            # zero elements so nonempty segments stay contiguous, and no
            # index clamp is needed (a trailing empty doc's natural offset
            # hi-lo is out of range; clamping it used to truncate the
            # preceding doc's segment by one token — batch-layout-dependent
            # signatures). Scatter results back into the nonempty rows.
            nonempty = doc_ends[i:j] > doc_starts[i:j]
            idx = (doc_starts[i:j][nonempty] - lo).astype(np.int64)
            if idx.size:
                sig[i:j][nonempty] = np.minimum.reduceat(mm, idx, axis=1).T
        i = j
    return sig


_ROLL_BASE = np.uint64(1099511628211)  # FNV prime as polynomial base


def char_shingle_hashes(texts: pa.Array, k: int = 5):
    """string column → (flat uint64 k-byte rolling-hash shingle ids,
    offsets per row) — the vectorized scale path for n-gram near-dup.

    A polynomial rolling hash over the column's CONCATENATED utf-8 byte
    buffer: one sliding-window pass computes every window hash, then
    ragged-range indexing selects each row's valid windows (windows that
    straddle row boundaries are never selected). Shingles are byte-level
    (equivalent to char-level for ASCII; a deterministic, similarity-
    preserving approximation for multi-byte text). Rows shorter than k
    contribute one whole-row shingle; empty rows contribute none —
    mirroring the py reference ``char_shingles``.
    """
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    if len(arr) == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    if data_buf is None:
        return np.empty(0, np.uint64), np.zeros(len(arr) + 1, np.int64)
    offs_all = np.frombuffer(off_buf, off_dtype)
    offs = offs_all[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(data_buf, np.uint8, count=offs[-1])
    lens = offs[1:] - offs[:-1]

    # window hashes over the whole buffer (k-1 bogus tail values unused)
    N = len(data)
    H = np.zeros(max(0, N - k + 1), np.uint64)
    if len(H):
        powers = _ROLL_BASE ** np.arange(k, dtype=np.uint64)
        d64 = data.astype(np.uint64)
        for j in range(k):
            H += (d64[j: N - k + 1 + j] + np.uint64(1)) * powers[j]

    counts = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1)).astype(np.int64)
    out_offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(out_offsets[-1])
    out = np.empty(total, np.uint64)

    # rows with >= k bytes: ragged-range gather from H
    long_mask = lens >= k
    if long_mask.any():
        c_long = counts * long_mask
        starts = np.repeat(offs[:-1], c_long)
        within = np.arange(int(c_long.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(c_long) - c_long, c_long
        )
        vals = H[starts + within]
        dest = np.repeat(out_offsets[:-1], c_long) + within
        out[dest] = vals

    # short non-empty rows: one whole-row polynomial hash each (few)
    short_idx = np.flatnonzero((~long_mask) & (lens > 0))
    for i in short_idx:
        b = data[offs[i]:offs[i + 1]].astype(np.uint64)
        p = _ROLL_BASE ** np.arange(len(b), dtype=np.uint64)
        out[out_offsets[i]] = np.uint64(((b + np.uint64(1)) * p).sum(dtype=np.uint64))
    return out, out_offsets


def window_hash_positions(texts: pa.Array, L: int):
    """string column → (flat uint64 L-byte window rolling hashes, flat
    int64 within-row byte positions, int64 offsets per row).

    The exact-substring-dedup variant of :func:`char_shingle_hashes`
    (same single-pass polynomial hash over the column's concatenated
    utf-8 buffer, same ragged-range gather) with two deliberate
    differences: rows shorter than ``L`` contribute NO windows (an exact
    match must span a full L-window — a short row can never carry one),
    and each window's byte position inside its row is returned so a
    verify stage can re-extract and byte-compare the actual text.
    Positions are byte offsets == character offsets for ASCII corpora
    (the verify consumer asserts nothing about multi-byte text; the
    oracle's char-based ``substring`` only coincides for ASCII)."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    if len(arr) == 0 or arr.buffers()[2] is None:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.zeros(len(arr) + 1, np.int64))
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs_all = np.frombuffer(arr.buffers()[1], off_dtype)
    offs = offs_all[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8, count=offs[-1])
    lens = offs[1:] - offs[:-1]

    N = len(data)
    H = np.zeros(max(0, N - L + 1), np.uint64)
    if len(H):
        powers = _ROLL_BASE ** np.arange(L, dtype=np.uint64)
        d64 = data.astype(np.uint64)
        for j in range(L):
            H += (d64[j: N - L + 1 + j] + np.uint64(1)) * powers[j]

    counts = np.maximum(lens - L + 1, 0).astype(np.int64)
    out_offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(out_offsets[-1])
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), out_offsets
    starts = np.repeat(offs[:-1], counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)
    return H[starts + within], within, out_offsets
