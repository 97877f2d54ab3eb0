"""Transitive clustering: similarity edges → connected components →
``entity_id`` per conversation.

Reference analog: the gold ``cluster_id`` equivalence class is defined as
the transitive closure of "same product" (``data/ali/README.md:41``, U3) —
the reference never computes it (labels are given); this engine must.

Algorithm: distributed min-label propagation (hash-partitioned edge
exchange, BASELINE.json north_star). Labels start as each node's own id;
every round each node takes the min label over itself and its neighbors
(both edge directions) via one bucketed hash join + one bucketed
``groupby(node).min`` — exactly two all-to-all exchanges per round.
Convergence is detected by a content signature (sum of
``stable_hash(node|label)`` over the label table): one cheap streaming
aggregate instead of a join against the previous round. ER similarity
graphs are near-clique clusters with small diameter, so rounds ≈
O(log max-component diameter); ``max_rounds`` bounds pathological chains.

Small-graph fast path: when the (already thresholded) edge set fits on
the driver (``driver_threshold``, default 2M edges ≈ tens of MB), a
single-pass union-find runs driver-side — the same pattern as
broadcasting a small join side instead of shuffling it. The distributed
path is the default semantics and is exercised in tests with
``driver_threshold=0``; at 10^12-turn scale the edge table exceeds any
threshold and every round streams through the object store.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bucketed_group_map, bucketed_join, stable_hash64


def _min_label_bucket(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("node", sort=False)["label"].min()
    return pd.DataFrame({"node": g.index.to_numpy(), "label": g.to_numpy()})


def _label_signature(labels) -> int:
    """Order-independent content signature of the (node,label) table:
    uint64 wrap-sum of stable row hashes. Equal signatures across rounds
    ⇒ no label changed (collision odds ~2^-64 per round)."""
    import pyarrow.compute as pc

    def part(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(batch["node"], batch["label"], "|")
        h = stable_hash64(key)
        s = int(h.sum(dtype=np.uint64))
        return pa.table({"s": pa.array([s], pa.uint64())})

    total = 0
    for row in labels.map_batches(part, batch_format="pyarrow").take_all():
        total = (total + int(row["s"])) & ((1 << 64) - 1)
    return total


def _driver_cc(edges) -> "pa.Table":
    """Vectorized min-label propagation with pointer jumping over a
    driver-resident edge list (no Python-level per-edge loop).

    ``np.unique`` returns nodes lexicographically sorted, so the minimum
    node INDEX in a component is also the minimum ``conv_id`` — the final
    ``nodes[lab]`` therefore matches the distributed min-label fixpoint
    exactly."""
    import polars as pl

    from ..util import dataset_to_arrow

    tbl = dataset_to_arrow(edges)
    # polars string sort/search beats numpy object-array np.unique by ~an
    # order of magnitude on 10^6-edge lists (this runs on the driver —
    # constant time that would otherwise cap scaling efficiency)
    all_s = pl.concat([pl.from_arrow(tbl["src"]), pl.from_arrow(tbl["dst"])])
    nodes_pl = all_s.unique().sort()
    codes = nodes_pl.search_sorted(all_s).to_numpy().astype(np.int64)
    nodes = nodes_pl.to_numpy()
    n = len(nodes)
    n_edges_rows = tbl.num_rows
    src = codes[:n_edges_rows]
    dst = codes[n_edges_rows:]
    lab = np.arange(n, dtype=np.int64)
    while True:
        old = lab.copy()
        m = np.minimum(lab[src], lab[dst])
        np.minimum.at(lab, src, m)
        np.minimum.at(lab, dst, m)
        lab = lab[lab]  # pointer jump: halves chain length per round
        if np.array_equal(lab, old):
            break
    return pa.table(
        {
            "node": pa.array(nodes, pa.string()),
            "label": pa.array(nodes[lab], pa.string()),
        }
    )


def connected_components(
    edges,
    num_buckets: int = 32,
    num_partitions: int = 32,
    max_rounds: int = 25,
    driver_threshold: int = 2_000_000,
):
    """EDGES dataset → (node, label) Dataset; label = min conv_id of the
    component. Nodes appearing in no edge are absent (callers treat missing
    nodes as singletons)."""
    import ray.data as rd

    edges = edges.materialize()  # reused every round; small relative to input
    n_edges = edges.count()
    if n_edges == 0:
        empty = pa.table(
            {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
        )
        return rd.from_arrow(empty)
    if n_edges <= driver_threshold:
        return rd.from_arrow(_driver_cc(edges))

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
    sig = _label_signature(labels)

    for _ in range(max_rounds):
        # neighbor messages: (node ← label of nbr); one bucketed join
        msgs = bucketed_join(
            adj,
            labels.rename_columns({"node": "nbr"}),
            on="nbr",
            num_buckets=num_buckets,
        ).select_columns(["node", "label"])
        new_labels = bucketed_group_map(
            labels.union(msgs),
            key="node",
            fn=_min_label_bucket,
            num_buckets=num_buckets,
        ).materialize()
        new_sig = _label_signature(new_labels)
        labels = new_labels
        if new_sig == sig:
            break
        sig = new_sig
    return labels


def assign_entities(conversations, components, num_partitions: int = 32,
                    broadcast_threshold: int = 5_000_000):
    """conversations + (node,label) → ENTITIES: every conv gets an entity_id;
    nodes absent from the edge graph are singletons (entity_id = conv_id).

    Hybrid: components ≤ threshold → zero-copy broadcast index + map-side
    lookup (no shuffle); larger → left-outer bucketed join."""
    import pyarrow.compute as pc

    if components.count() <= broadcast_threshold:
        import ray

        from ..util import (broadcast_lookup, build_broadcast_index,
                            dataset_to_arrow)

        comp = dataset_to_arrow(components.materialize())
        if comp.num_rows == 0:
            return conversations.select_columns(["conv_id"]).map_batches(
                lambda b: pa.table(
                    {"conv_id": b["conv_id"], "entity_id": b["conv_id"]}
                ),
                batch_format="pyarrow", zero_copy_batch=True,
            )
        ref = ray.put(build_broadcast_index(comp, "node", ["label"]))

        def fill_bc(batch: pa.Table) -> pa.Table:
            idx = ray.get(ref)
            ent = broadcast_lookup(idx, batch["conv_id"], "label")
            return pa.table(
                {
                    "conv_id": batch["conv_id"],
                    "entity_id": pc.coalesce(ent, batch["conv_id"]),
                }
            )

        return conversations.select_columns(["conv_id"]).map_batches(
            fill_bc, batch_format="pyarrow", zero_copy_batch=True
        )

    joined = bucketed_join(
        conversations.select_columns(["conv_id"]),
        components.rename_columns({"node": "conv_id", "label": "entity_id"}),
        on="conv_id",
        how="left_outer",
        num_buckets=num_partitions,
    )

    def fill(batch: pa.Table) -> pa.Table:
        ent = pc.coalesce(batch["entity_id"], batch["conv_id"])
        return pa.table({"conv_id": batch["conv_id"], "entity_id": ent})

    return joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
