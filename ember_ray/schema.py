"""Arrow schemas for every logical table in the engine.

Mirrors the reference's three table shapes (corpus / pair table / feature
batches — SURVEY.md §1.1, ``/root/reference/scripts/construction/
build_ali_corpus.py:7-15``) re-expressed for transcript input
(BASELINE.json input_hint).
"""

from __future__ import annotations

import pyarrow as pa

# Primary engine input: one row per conversation turn.
TRANSCRIPTS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Ground truth: gold entity clusters (analog of the ali corpus `cluster_id`,
# /root/reference/data/ali/README.md:41 — same cluster ⇔ same entity).
GOLD_CLUSTERS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("cluster_id", pa.int64()),
    ]
)

# Assembled record corpus: one row per conversation (the ER unit), the
# analog of the reference corpus DataFrame (one row per product record).
CONVERSATIONS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_turns", pa.int32()),
        pa.field("text", pa.string()),  # turns joined with "\n" in turn_idx order
        pa.field("first_role", pa.string()),
        pa.field("tools", pa.string()),  # distinct tool names, sorted, ";"-joined
    ]
)

# + derived ephemeral column `tokens: list<string>` (analog of
#   `tokenized_title`, build_ali_dataset.py:346-349).
TOKENIZED = CONVERSATIONS.append(pa.field("tokens", pa.list_(pa.string())))

# Blocking output: exploded (block_key, conv_id) membership rows.
BLOCKS = pa.schema(
    [
        pa.field("block_key", pa.string()),
        pa.field("conv_id", pa.string()),
    ]
)

# Candidate pair table (reference pair-table shape with _left/_right
# suffixes, build_ali_dataset.py:82-84; canonical conv_id_left < conv_id_right).
CANDIDATE_PAIRS = pa.schema(
    [
        pa.field("conv_id_left", pa.string()),
        pa.field("conv_id_right", pa.string()),
    ]
)

SCORED_PAIRS = pa.schema(
    [
        pa.field("conv_id_left", pa.string()),
        pa.field("conv_id_right", pa.string()),
        pa.field("jaccard", pa.float64()),
        pa.field("jaro_winkler", pa.float64()),
        pa.field("levenshtein", pa.float64()),
        pa.field("tfidf_cosine", pa.float64()),
        pa.field("score", pa.float64()),
    ]
)

# Similarity edges above threshold (input to clustering).
EDGES = pa.schema(
    [
        pa.field("src", pa.string()),
        pa.field("dst", pa.string()),
    ]
)

# Clustering output: predicted entity assignment.
ENTITIES = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("entity_id", pa.string()),  # min conv_id of the component
    ]
)

# Per-partition lineage manifest record (state/checkpoint.py).
MANIFEST = pa.schema(
    [
        pa.field("stage", pa.string()),
        pa.field("partition_id", pa.int32()),
        pa.field("input_fingerprint", pa.string()),
        pa.field("row_count", pa.int64()),
        pa.field("wall_s", pa.float64()),
    ]
)
