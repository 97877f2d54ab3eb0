"""Conversation assembly: transcripts (one row per turn) → conversations
(one row per conv_id), the ER record unit.

Reference analog: the corpus build + group-union aggregate
(``build_ali_dataset.py:50-51,153-156``) and, per BASELINE.json
north_star, "conversations are assembled per conv_id via groupby-aggregate
under stable turn_idx ordering".

Invariant (BASELINE.json input_hint): per-turn text equality — turns are
concatenated with "\\n" in strictly ascending ``turn_idx`` order with the
stored text byte-identical (normalization happens only downstream into
derived columns). Verified by tests/test_assemble.py.

Scale notes: one hash shuffle on ``conv_id`` (bucketed — a single int key,
not millions of tiny string groups); inside each bucket the group-concat is
a vectorized pandas groupby. Turns of one conversation co-locate in one
bucket, so ordering is a per-bucket sort, never a global one.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..util import bucketed_group_map, hash_exchange


def _assemble_bucket(df: pd.DataFrame) -> pd.DataFrame:
    # mergesort → stable: equal turn_idx keeps input order deterministically
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = df.groupby("conv_id", sort=False)
    text = g["text"].agg("\n".join)
    n_turns = g["turn_idx"].size().astype("int32")
    first_role = g["role"].first()
    tools = g["tool"].agg(lambda s: ";".join(sorted({x for x in s if x})))
    return pd.DataFrame(
        {
            "conv_id": text.index.to_numpy(),
            "n_turns": n_turns.to_numpy(),
            "text": text.to_numpy(),
            "first_role": first_role.to_numpy(),
            "tools": tools.to_numpy(),
        }
    )


def _assemble_bucket_arrow(tokenizer: str | None):
    """Arrow-mode reduce: pandas group-concat + (optionally) tokenize the
    assembled text IN the reduce task. Fusing tokenize here removes a full
    second materialize pass + one Ray Data job over the conversation table
    (~GBs at the scaling-corpus size — pure cpu-count-independent tax)."""
    from ..functions.text import tokenize_array, tokenize_array_cjk

    tok = None
    if tokenizer is not None:
        tok = {"word": tokenize_array, "cjk": tokenize_array_cjk}[tokenizer]

    def fn(tbl: pa.Table) -> pa.Table:
        out = _assemble_bucket(tbl.to_pandas())
        t = pa.table(
            {
                "conv_id": pa.array(out["conv_id"].to_numpy(), pa.string()),
                "n_turns": pa.array(out["n_turns"].to_numpy(), pa.int32()),
                "text": pa.array(out["text"].to_numpy(), pa.string()),
                "first_role": pa.array(out["first_role"].to_numpy(), pa.string()),
                "tools": pa.array(out["tools"].to_numpy(), pa.string()),
            }
        )
        if tok is not None:
            t = t.append_column("tokens", tok(t["text"]))
        return t

    return fn


def assemble_conversations(transcripts, num_buckets: int = 64,
                           tokenizer: str | None = None):
    """transcripts Dataset → conversations Dataset (schema.CONVERSATIONS).

    ``tokenizer`` ("word" | "cjk"): fuse the TOKENIZED derivation into the
    assembly reduce tasks (schema.TOKENIZED output) instead of a separate
    ``add_tokens`` pass over the materialized conversations."""
    return hash_exchange(
        transcripts.select_columns(["conv_id", "turn_idx", "role", "text", "tool"]),
        key="conv_id",
        num_buckets=num_buckets,
        reduce_fn=_assemble_bucket_arrow(tokenizer),
        arrow=True,
    )
