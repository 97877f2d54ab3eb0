"""Survivorship / canonicalization: one merged "golden record" per
predicted entity.

The ER pipeline ends at a (conv_id → entity_id) assignment
(``stages/cluster.py``); a real consumer then needs one record per
entity built by survivorship rules over the members — the step the
reference leaves to its downstream dataset builders
(``build_ali_dataset.py``'s per-cluster representative picks). Rules
implemented (classic data-fusion policies):

- ``canonical_conv_id`` — smallest member id (stable-identifier rule);
- ``rep_conv_id`` / ``rep_n_chars`` — the member with the LONGEST
  assembled text, ties broken by smaller conv_id (most-complete-record
  rule);
- ``n_conversations`` / ``n_turns`` / ``n_chars`` — additive merge of
  member masses.

Every output is an int64 or string, so the DuckDB oracle (which
re-derives the partition via the recursive-CTE closure and the
conversation texts via ``string_agg``) matches exactly — no float
recipe involved.

Distributed shape: entity ids attach map-side (hybrid broadcast /
bucketed — the confusion-matrix rule), each batch collapses to
per-entity partial rows with one vectorized pandas groupby, and one
``bucketed_group_map`` exchange merges the partials — the same
partial+final shape as ``latest_order``; the conversation text never
crosses the exchange (only its length does).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def golden_records(
    conversations,
    entities,
    num_partitions: int = 32,
    broadcast_threshold: int = 5_000_000,
):
    """Assembled conversations × (conv_id → entity_id) → one golden
    record per entity (see module docstring for the rules)."""
    import ray

    ds = conversations.select_columns(["conv_id", "n_turns", "text"])

    if entities.count() <= broadcast_threshold:
        from ..util import build_sharded_index_async, sharded_lookup

        erefs = build_sharded_index_async(
            entities.select_columns(["conv_id", "entity_id"]).materialize(),
            "conv_id", ["entity_id"], num_shards=8)

        def attach(batch: pa.Table) -> pa.Table:
            eidx = [ray.get(r) for r in erefs]
            return pa.table({
                "entity_id": sharded_lookup(eidx, batch["conv_id"],
                                            "entity_id"),
                "conv_id": batch["conv_id"],
                "n_turns": batch["n_turns"],
                "n_chars": pc.cast(pc.utf8_length(batch["text"]),
                                   pa.int64()),
            })

        ds = ds.map_batches(attach, batch_format="pyarrow",
                            zero_copy_batch=True)
    else:
        from ..util import bucketed_join

        def lengths(batch: pa.Table) -> pa.Table:
            return pa.table({
                "conv_id": batch["conv_id"],
                "n_turns": batch["n_turns"],
                "n_chars": pc.cast(pc.utf8_length(batch["text"]),
                                   pa.int64()),
            })

        ds = bucketed_join(
            ds.map_batches(lengths, batch_format="pyarrow",
                           zero_copy_batch=True),
            entities.select_columns(["conv_id", "entity_id"]),
            on="conv_id", num_buckets=num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "entity_id": batch["entity_id"],
            "conv_id": batch["conv_id"],
            "n_turns": pc.cast(batch["n_turns"], pa.int64()),
            "n_chars": batch["n_chars"],
        }).to_pandas()
        base = df.groupby("entity_id", sort=False, as_index=False).agg(
            canonical_conv_id=("conv_id", "min"),
            n_conversations=("conv_id", "size"),
            n_turns=("n_turns", "sum"),
            n_chars=("n_chars", "sum"),
        )
        rep = (df.sort_values(["entity_id", "n_chars", "conv_id"],
                              ascending=[True, False, True])
               .drop_duplicates("entity_id")
               .rename(columns={"conv_id": "rep_conv_id",
                                "n_chars": "rep_n_chars"})
               [["entity_id", "rep_conv_id", "rep_n_chars"]])
        out = base.merge(rep, on="entity_id")
        out["n_conversations"] = out["n_conversations"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=8192)

    def fin(df):
        base = df.groupby("entity_id", sort=False, as_index=False).agg(
            canonical_conv_id=("canonical_conv_id", "min"),
            n_conversations=("n_conversations", "sum"),
            n_turns=("n_turns", "sum"),
            n_chars=("n_chars", "sum"),
        )
        rep = (df.sort_values(["entity_id", "rep_n_chars", "rep_conv_id"],
                              ascending=[True, False, True])
               .drop_duplicates("entity_id")
               [["entity_id", "rep_conv_id", "rep_n_chars"]])
        return base.merge(rep, on="entity_id")

    from ..util import bucketed_group_map

    return bucketed_group_map(parts, "entity_id", fin,
                              num_buckets=num_partitions)
