"""Text normalization & tokenization kernels (reference M3/M6/M7 analogs).

The stored ``text`` column is NEVER mutated (per-turn text equality
invariant, BASELINE.json input_hint) — normalization writes derived
columns only.

Reference semantics reproduced:
  * attribute-map flattening: ``pv_pairs``-style ``#;#`` / ``#:#``
    separators → spaces (``src/datamodules/alidatamodule.py:119-126``,
    ``scripts/dm.py:244-245``).
  * tokenizer: non-blank tokens only — ``filter(str.strip, cut(s))``
    (``scripts/construction/build_ali_dataset.py:346-349``); ours is a
    whitespace/word-regex tokenizer (no jieba for ASCII-ish transcripts).
  * multi-column concat with null-coalesce (``alidatamodule.py:128-134``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"[^\s.,;:!?()\[\]{}\"']+")

ATTR_SEPS = ("#;#", "#:#")


def flatten_attrs(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Replace ali-style attribute separators with spaces (M6/F3)."""
    out = arr
    for sep in ATTR_SEPS:
        out = pc.replace_substring(out, pattern=sep, replacement=" ")
    return out


def normalize(arr) -> pa.ChunkedArray:
    """Derived normalization: flatten attrs, lowercase, strip punctuation,
    collapse whitespace. Never applied to the stored ``text`` column."""
    out = flatten_attrs(arr)
    out = pc.utf8_lower(out)
    out = pc.replace_substring_regex(
        out, pattern=r"[\s.,;:!?()\[\]{}\"']+", replacement=" "
    )
    return pc.utf8_trim_whitespace(out)


def tokenize_array(arr) -> pa.Array:
    """string array → list<string> of non-blank word tokens (M3 analog).

    Vectorized via Arrow: normalize → split on single spaces (normalize
    guarantees clean single-space separation). Blank tokens are dropped
    (reference: ``filter(str.strip, jieba.cut(s))``).
    """
    norm = normalize(arr)
    toks = pc.split_pattern(norm, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # an all-empty input row splits to [""] — rewrite those rows to []
    # vectorized: drop exactly those single "" tokens and re-derive offsets
    # (the old per-row python fallback rebuilt the WHOLE batch as lists)
    empty_rows = np.asarray(pc.equal(norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm, ""))
    if empty_rows.any():
        offsets = np.asarray(toks.offsets, np.int64)
        counts = np.diff(offsets)
        keep = np.ones(int(offsets[-1]), bool)
        keep[offsets[:-1][empty_rows]] = False  # empty row ⇒ one "" token
        new_counts = counts.copy()
        new_counts[empty_rows] = 0
        new_offsets = np.concatenate([[0], np.cumsum(new_counts)])
        values = toks.values.filter(pa.array(keep))
        return pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), values)
    return toks


_CJK_RE_CLASS = "[一-鿿]"  # CJK Unified Ideographs (the LangId zh range)


def tokenize_array_cjk(arr) -> pa.Array:
    """CJK-capable tokenizer variant (reference M3 parity for ali-like
    Chinese corpora, jieba at ``build_ali_dataset.py:346-349``): CJK runs
    are segmented to ONE TOKEN PER CHARACTER — the standard dictionary-free
    IR fallback (jieba's dictionary isn't available; the plain word-regex
    tokenizer would emit a whole CJK run as a single token, making token
    Jaccard useless on Chinese text). Non-CJK text tokenizes exactly like
    ``tokenize_array``. Fully vectorized: one regex pass isolates each CJK
    char with surrounding spaces before the normal normalize+split."""
    spaced = pc.replace_substring_regex(
        arr, pattern=f"({_CJK_RE_CLASS})", replacement=" \\1 "
    )
    return tokenize_array(spaced)


def detokenize(tokens: pa.Array, sep: str = " "):
    """list<string> → joined string per row (reference F5 ``' '.join``
    detokenize, dm.py:247-251). Vectorized ``pc.binary_join``."""
    lst = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    return pc.binary_join(lst, sep)


def format_paths(ids, suffix: str = ".bin", num_shards: int = 16):
    """id column → sharded path strings ``{id % shards}/{id}{suffix}``
    (reference M8/F7 path constructor, ``f"{id}.jpg"`` at
    alidatamodule.py:136-137 — plus the shard dir a resumable 100 TB
    output layout needs). Vectorized Arrow kernels only."""
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    shard = pc.cast(
        pc.subtract(ids, pc.multiply(pc.divide(ids, num_shards), num_shards)),
        pa.string(),
    )
    name = pc.binary_join_element_wise(
        pc.cast(ids, pa.string()), pa.array([suffix] * len(ids)), ""
    )
    return pc.binary_join_element_wise(shard, name, "/")


def tokenize_py(s: str) -> list[str]:
    """Single-string reference tokenizer (tests / oracles)."""
    t = s
    for sep in ATTR_SEPS:
        t = t.replace(sep, " ")
    return [w for w in _WORD_RE.findall(t.lower()) if w.strip()]


def concat_coalesce(arrays, sep: str = " ") -> pa.ChunkedArray:
    """Null-coalescing multi-column concat (M7/F4):
    ``sep.join(str(x or "") for x in cols)``."""
    filled = [pc.fill_null(a, "") for a in arrays]
    return pc.binary_join_element_wise(*filled, sep)


# ---------------------------------------------------------------------------
# PII scrubbing (curation extension): ordered RE2 patterns, applied most-
# specific first so the generic digit-run pass only sees what the earlier
# passes left behind. pyarrow's replace_substring_regex and DuckDB's
# regexp_replace are BOTH RE2, so the oracle reproduces these bitwise.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b555-[0-9]{4}\b", "[PHONE]"),
    (r"[0-9]+", "[NUM]"),
)


def scrub_pii(arr) -> tuple[pa.ChunkedArray, np.ndarray]:
    """Redact PII-shaped substrings; returns (scrubbed, n_redactions).

    Counts are taken per pattern on the progressively scrubbed text (a
    digit run inside an already-redacted email is not double-counted),
    mirroring the oracle's staged CTE exactly."""
    total = np.zeros(len(arr), np.int64)
    for pat, repl in PII_PATTERNS:
        cnt = pc.fill_null(pc.count_substring_regex(arr, pat), 0)
        total += np.asarray(cnt, dtype=np.int64)
        arr = pc.replace_substring_regex(arr, pat, repl)
    return arr, total
