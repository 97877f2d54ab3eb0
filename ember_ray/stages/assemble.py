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

from ..util import bucketed_group_map


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


def assemble_conversations(transcripts, num_buckets: int = 64):
    """transcripts Dataset → conversations Dataset (schema.CONVERSATIONS)."""
    return bucketed_group_map(
        transcripts.select_columns(["conv_id", "turn_idx", "role", "text", "tool"]),
        key="conv_id",
        fn=_assemble_bucket,
        num_buckets=num_buckets,
    )
