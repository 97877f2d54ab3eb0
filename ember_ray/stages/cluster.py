"""Transitive clustering: similarity edges → connected components →
``entity_id`` per conversation.

Reference analog: the gold ``cluster_id`` equivalence class is defined as
the transitive closure of "same product" (``data/ali/README.md:41``, U3) —
the reference never computes it (labels are given); this engine must.

Algorithm: distributed min-label propagation (hash-partitioned edge
exchange, BASELINE.json north_star). Labels start as each node's own id;
every round each node takes the min label over itself and its neighbors
(both edge directions), via hash-partitioned ``Dataset.join`` + bucketed
``groupby(node).min``. The driver loops until a round changes no label
(convergence check = one count aggregate). ER similarity graphs are
near-clique clusters with small diameter, so rounds ≈ O(log max-component
diameter), not O(n); ``max_rounds`` bounds pathological chains.

Each round materializes only the (node,label) table — edges stream from
the object store unchanged; labels checkpoint per round so a killed run
resumes mid-closure (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bucketed_group_map


def _min_label_bucket(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("node", sort=False)["label"].min()
    return pd.DataFrame({"node": g.index.to_numpy(), "label": g.to_numpy()})


def connected_components(
    edges,
    num_buckets: int = 32,
    num_partitions: int = 32,
    max_rounds: int = 25,
):
    """EDGES dataset → (node, label) Dataset; label = min conv_id of the
    component. Nodes appearing in no edge are absent (callers treat missing
    nodes as singletons)."""
    import ray.data as rd

    edges = edges.materialize()  # reused every round; small relative to input
    if edges.count() == 0:
        empty = pa.table(
            {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
        )
        return rd.from_arrow(empty)

    def both_dirs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in (batch["src"], batch["dst"])]
                ),
                "nbr": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in (batch["dst"], batch["src"])]
                ),
            }
        )

    adj = edges.map_batches(both_dirs, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    # init: label(node) = node
    labels = bucketed_group_map(
        adj.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow",
        ),
        key="node",
        fn=_min_label_bucket,
        num_buckets=num_buckets,
    ).materialize()

    from ..util import hash_join

    for _ in range(max_rounds):
        # neighbor messages: (node ← label of nbr)
        msgs = hash_join(
            adj,
            labels.rename_columns({"node": "nbr"}),
            on="nbr",
            num_partitions=num_partitions,
        ).select_columns(["node", "label"])
        new_labels = bucketed_group_map(
            labels.union(msgs),
            key="node",
            fn=_min_label_bucket,
            num_buckets=num_buckets,
        ).materialize()

        changed = (
            hash_join(
                new_labels.rename_columns({"label": "label_new"}),
                labels,
                on="node",
                num_partitions=num_partitions,
            )
            .map_batches(
                lambda b: pa.table(
                    {
                        "n": pa.array(
                            [
                                int(
                                    np.sum(
                                        np.asarray(b["label_new"]) != np.asarray(b["label"])
                                    )
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .sum("n")
        )
        labels = new_labels
        if not changed:
            break
    return labels


def assign_entities(conversations, components, num_partitions: int = 32):
    """conversations + (node,label) → ENTITIES: every conv gets an entity_id;
    nodes absent from the edge graph are singletons (entity_id = conv_id)."""
    import pyarrow.compute as pc

    from ..util import hash_join

    joined = hash_join(
        conversations.select_columns(["conv_id"]),
        components.rename_columns({"node": "conv_id", "label": "entity_id"}),
        on="conv_id",
        how="left_outer",
        num_partitions=num_partitions,
    )

    def fill(batch: pa.Table) -> pa.Table:
        ent = pc.coalesce(batch["entity_id"], batch["conv_id"])
        return pa.table({"conv_id": batch["conv_id"], "entity_id": ent})

    return joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
