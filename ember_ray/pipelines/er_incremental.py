"""Incremental ER: match an ingest batch of NEW conversations against
the EXISTING entity catalog — the per-batch serving shape of the
flagship pipeline (the ER analog of ``dedup.dedup_incremental``).

A production deployment does not re-resolve the world per ingest: it
probes a pre-built blocking index of the old corpus with the new
records, scores only (new, old) candidates, and assigns each new record
to the best-matching existing entity above threshold (else it founds a
new entity). Sandbox shape vs deployment (same argument as
``dedup_incremental``): candidates come from the flagship run's scored
pairs — both sides hash into the same LSH band buckets, which is
exactly what probing a pre-built band index of the old corpus computes,
without maintaining one in a test harness. The old entity catalog is
the transitive closure over old–old edges only (the state the previous
full run would have left behind).

Semantics: each new record is matched INDEPENDENTLY against the old
catalog (new–new resolution is deferred to the next full run) — the
standard streaming-ER admission semantics. "New" is the deterministic
stand-in ``conv_id`` ends with ``new_suffix`` (SQL-expressible:
``LIKE '%<suffix>'``), ≈10% of the corpus.

Scale shape: the per-new argmax exchanges only (new_id, old_id, score)
triples of above-threshold candidates; the bounded batch-sized result
is broadcast for the final attach; the old-catalog lookup touches only
the matched old ids (one map-side filter of the entities table against
a broadcast sorted id array — never the full catalog on the driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def incremental_match(
    scored,
    conversations,
    threshold: float,
    new_suffix: str = "0",
    num_buckets: int = 16,
    num_partitions: int = 8,
    export_candidates: str | None = None,
):
    """scored pairs + conversations → (conv_id, entity_id, matched_conv)
    for every NEW conversation; ``matched_conv`` = the best old partner
    (score ≥ threshold, ties to the smaller old id) or ``''`` when the
    record founds a new entity (entity_id = its own conv_id)."""
    import ray

    from ..stages.cluster import assign_entities, connected_components
    from ..util import (broadcast_lookup, build_broadcast_index,
                        dataset_to_arrow, hash_exchange)

    def _is_new(col) -> pa.Array:
        return pc.ends_with(col, pattern=new_suffix)

    # --- old entity catalog: closure over old-old edges only ------------
    def old_edges(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["score"], pa.scalar(threshold)),
            pc.and_(pc.invert(_is_new(t["conv_id_left"])),
                    pc.invert(_is_new(t["conv_id_right"]))))
        k = t.filter(keep)
        return pa.table({"src": k["conv_id_left"], "dst": k["conv_id_right"]})

    comps = connected_components(
        scored.map_batches(old_edges, batch_format="pyarrow",
                           zero_copy_batch=True),
        num_buckets=num_buckets, num_partitions=num_partitions)

    def only_old(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(_is_new(t["conv_id"])))

    old_entities = assign_entities(
        conversations.select_columns(["conv_id"]).map_batches(
            only_old, batch_format="pyarrow", zero_copy_batch=True),
        comps, num_partitions=num_partitions)

    # --- (new, old) candidates above threshold --------------------------
    def cands(t: pa.Table) -> pa.Table:
        empty = pa.table({"new_id": pa.array([], pa.string()),
                          "old_id": pa.array([], pa.string()),
                          "score": pa.array([], pa.float64())})
        k = t.filter(pc.greater_equal(t["score"], pa.scalar(threshold)))
        if k.num_rows == 0:
            return empty
        ln = np.asarray(_is_new(k["conv_id_left"]))
        rn = np.asarray(_is_new(k["conv_id_right"]))
        k_lr = k.filter(pa.array(ln & ~rn))  # left new, right old
        k_rl = k.filter(pa.array(rn & ~ln))
        return pa.concat_tables([
            pa.table({"new_id": k_lr["conv_id_left"],
                      "old_id": k_lr["conv_id_right"],
                      "score": pc.cast(k_lr["score"], pa.float64())}),
            pa.table({"new_id": k_rl["conv_id_right"],
                      "old_id": k_rl["conv_id_left"],
                      "score": pc.cast(k_rl["score"], pa.float64())}),
        ]).combine_chunks()

    cand_ds = scored.map_batches(cands, batch_format="pyarrow",
                                 zero_copy_batch=True)
    if export_candidates:
        import shutil

        shutil.rmtree(export_candidates, ignore_errors=True)
        cand_ds = cand_ds.materialize()
        cand_ds.write_parquet(export_candidates)

    # --- per-new argmax: best (score DESC, old_id ASC) -------------------
    def best_of(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"new_id": pa.array([], pa.string()),
                             "old_id": pa.array([], pa.string())})
        df = t.to_pandas()
        b = (df.sort_values(["new_id", "score", "old_id"],
                            ascending=[True, False, True])
             .drop_duplicates("new_id"))
        return pa.table({"new_id": pa.array(b["new_id"], pa.string()),
                         "old_id": pa.array(b["old_id"], pa.string())})

    best = dataset_to_arrow(hash_exchange(
        cand_ds, "new_id", num_buckets, best_of, arrow=True))

    # --- old-catalog lookup for the matched ids only ---------------------
    matched = pc.unique(best["old_id"]) if best.num_rows else pa.array(
        [], pa.string())
    mref = ray.put(np.sort(np.asarray(matched).astype("U")))

    def hit_entities(t: pa.Table) -> pa.Table:
        m = ray.get(mref)
        if len(m) == 0 or t.num_rows == 0:
            return t.slice(0, 0)
        ids = np.asarray(t["conv_id"]).astype("U")
        pos = np.minimum(np.searchsorted(m, ids), len(m) - 1)
        return t.filter(pa.array(m[pos] == ids))

    ent_small = dataset_to_arrow(old_entities.map_batches(
        hit_entities, batch_format="pyarrow", zero_copy_batch=True))

    bref = ray.put(build_broadcast_index(best, "new_id", ["old_id"])
                   if best.num_rows else None)
    eref = ray.put(build_broadcast_index(ent_small, "conv_id",
                                         ["entity_id"])
                   if ent_small.num_rows else None)

    # --- final attach over the new-record stream --------------------------
    def only_new(t: pa.Table) -> pa.Table:
        return t.filter(_is_new(t["conv_id"]))

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "entity_id": pa.array([], pa.string()),
                             "matched_conv": pa.array([], pa.string())})
        bidx = ray.get(bref)
        eidx = ray.get(eref)
        ids = t["conv_id"]
        if bidx is None:
            old = pa.nulls(t.num_rows, pa.string())
        else:
            old = broadcast_lookup(bidx, ids, "old_id")
        # '' is never a conv_id: unmatched rows look up to null, which
        # coalesces to "found a new entity" below (null inputs must not
        # reach the hash-keyed lookup)
        old = pc.coalesce(old, pa.scalar(""))
        if eidx is None:
            ent = pa.nulls(t.num_rows, pa.string())
        else:
            ent = broadcast_lookup(eidx, old, "entity_id")
        return pa.table({
            "conv_id": ids,
            "entity_id": pc.coalesce(ent, ids),
            "matched_conv": old,
        })

    return (conversations.select_columns(["conv_id"])
            .map_batches(only_new, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(attach, batch_format="pyarrow",
                         zero_copy_batch=True))
