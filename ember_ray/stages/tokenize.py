"""Tokenization stage: conversations → conversations + ``tokens`` column.

Reference analog: jieba tokenization into ``tokenized_title``
(``build_ali_dataset.py:346-349``, M3) — stateless here because the
word-regex tokenizer needs no dictionary load; it runs as plain
``map_batches`` tasks over zero-copy Arrow (a dictionary-backed tokenizer
would become a callable class = actor pool, reference T1 pattern).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import tokenize_array


def _add_tokens(batch: pa.Table) -> pa.Table:
    return batch.append_column("tokens", tokenize_array(batch["text"]))


def add_tokens(conversations, text_col: str = "text"):
    if text_col == "text":
        return conversations.map_batches(
            _add_tokens, batch_format="pyarrow", zero_copy_batch=True
        )

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("tokens", tokenize_array(batch[text_col]))

    return conversations.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
