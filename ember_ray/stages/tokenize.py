"""Tokenization stage: conversations → conversations + ``tokens`` column.

Reference analog: jieba tokenization into ``tokenized_title``
(``build_ali_dataset.py:346-349``, M3) — stateless here because the
word-regex tokenizer needs no dictionary load; it runs as plain
``map_batches`` tasks over zero-copy Arrow (a dictionary-backed tokenizer
would become a callable class = actor pool, reference T1 pattern).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import tokenize_array, tokenize_array_cjk


def _add_tokens(batch: pa.Table) -> pa.Table:
    return batch.append_column("tokens", tokenize_array(batch["text"]))


def add_tokens(conversations, text_col: str = "text", tokenizer: str = "word"):
    """Append a ``tokens`` column. ``tokenizer``: "word" (default regex
    word tokenizer) or "cjk" (CJK runs segmented per character — the
    dictionary-free stand-in for the reference's jieba on ali-like
    Chinese corpora, build_ali_dataset.py:346-349)."""
    if tokenizer == "word" and text_col == "text":
        return conversations.map_batches(
            _add_tokens, batch_format="pyarrow", zero_copy_batch=True
        )
    tok = {"word": tokenize_array, "cjk": tokenize_array_cjk}[tokenizer]

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("tokens", tok(batch[text_col]))

    return conversations.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
