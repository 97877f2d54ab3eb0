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


def minhash_signatures(
    tokens: pa.Array, num_perm: int = 64, seed: int = 142
) -> np.ndarray:
    """→ (n_docs, num_perm) uint64 signature matrix.

    sig[i] = min over the doc's token hashes h of (a_i·h + b_i) mod 2^61−1.
    Empty docs get the max-hash sentinel signature.
    """
    a, b = _perm_params(num_perm, seed)
    h, offsets = token_hashes(tokens)
    n = len(offsets) - 1
    sig = np.full((n, num_perm), _MAX_HASH, dtype=np.uint64)
    # overflow-free (mod 2^64) multiply-add is fine: we only need a fixed
    # deterministic permutation family, not number-theoretic guarantees
    for i in range(n):
        hh = h[offsets[i]:offsets[i + 1]]
        if not hh.size:
            continue
        hh = np.unique(hh)
        m = (a[:, None] * hh[None, :] + b[:, None]) & _MERSENNE
        sig[i] = m.min(axis=1)
    return sig


def lsh_band_keys(sig: np.ndarray, num_bands: int) -> list[list[str]]:
    """Signature matrix → per-doc list of band keys ``"b{band}:{hash:x}"``.

    num_perm must divide into num_bands equal rows-per-band; two docs share
    a band key iff their signatures agree on that band's rows.
    """
    n, num_perm = sig.shape
    assert num_perm % num_bands == 0, "num_perm must be divisible by num_bands"
    r = num_perm // num_bands
    keys: list[list[str]] = [[] for _ in range(n)]
    mult = np.uint64(0x9E3779B97F4A7C15)
    for band in range(num_bands):
        chunk = sig[:, band * r:(band + 1) * r]
        mix = np.zeros(n, np.uint64)
        for j in range(r):
            mix = (mix ^ chunk[:, j]) * mult
        for i in range(n):
            keys[i].append(f"b{band}:{mix[i]:016x}")
    return keys


def simhash(tokens: pa.Array, seed: int = 142) -> np.ndarray:
    """64-bit SimHash per doc: sign of tf-weighted bit sums of token hashes."""
    h, offsets = token_hashes(tokens)
    n = len(offsets) - 1
    out = np.zeros(n, np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i in range(n):
        hh = h[offsets[i]:offsets[i + 1]]
        if not hh.size:
            continue
        ids, tf = np.unique(hh, return_counts=True)
        bitmat = ((ids[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((bitmat * 2 - 1) * tf[:, None]).sum(axis=0)
        out[i] = np.uint64(((acc > 0).astype(np.uint64) << bits).sum(dtype=np.uint64))
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
