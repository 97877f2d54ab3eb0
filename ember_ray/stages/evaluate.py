"""Pairwise evaluation: predicted entities vs gold clusters on the
candidate-pair set.

Reference analog: positive-class F1/precision/recall accumulated across
batches (``src/models/matcher.py:14-24,26-42``, torchmetrics with
``ignore_index=0``; A4). Evaluation is conditioned on the candidate pairs
produced by blocking — exactly as the reference evaluates on its
constructed pair table, "at the same blocking key" (BASELINE.json).

Partial+final aggregate: each Arrow batch reduces to one (tp,fp,fn,tn)
row inside ``map_batches``; the driver sums the tiny partials and computes
P/R/F1 — no materialization of the pair table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _broadcast_attach(pairs, entities, gold):
    """Map-side attach of entity/cluster ids to both pair sides from a
    driver-broadcast zero-copy Arrow index (``ray.put`` once; workers read
    it zero-copy — a python dict would unpickle per task and serialize the
    stage)."""
    import ray

    from ..util import build_sharded_index_async, sharded_lookup

    # two independent SHARDED indexes built by parallel background tasks
    # over the materialized blocks — the old driver-side gather + index
    # build was ~2-3 s of cpu-count-independent serial time at 1.8M rows
    # (no driver-side pandas merge either — that outer merge on 10^5-row
    # string keys was pure constant time on the driver)
    erefs = build_sharded_index_async(
        entities.materialize(), "conv_id", ["entity_id"], num_shards=8)
    grefs = build_sharded_index_async(
        gold.select_columns(["conv_id", "cluster_id"]).materialize(),
        "conv_id", ["cluster_id"], num_shards=8)

    def attach(batch: pa.Table) -> pa.Table:
        eidx = [ray.get(r) for r in erefs]
        gidx = [ray.get(r) for r in grefs]
        l, r = batch["conv_id_left"], batch["conv_id_right"]
        return pa.table(
            {
                "entity_left": sharded_lookup(eidx, l, "entity_id"),
                "entity_right": sharded_lookup(eidx, r, "entity_id"),
                "cluster_left": sharded_lookup(gidx, l, "cluster_id"),
                "cluster_right": sharded_lookup(gidx, r, "cluster_id"),
            }
        )

    return pairs.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def _attach(pairs, table, key_new: tuple[str, str], value: str, num_partitions: int):
    """Join `table`(conv_id,value) onto one pair side with renamed columns."""
    from ..util import bucketed_join

    side_key, value_name = key_new
    renamed = table.rename_columns({"conv_id": side_key, value: value_name})
    return bucketed_join(pairs, renamed, on=side_key,
                         num_buckets=num_partitions)


def pairwise_confusion(
    candidate_pairs,
    entities,
    gold,
    num_partitions: int = 32,
    broadcast_threshold: int = 5_000_000,
):
    """candidate pairs × predicted entities × gold clusters → dict of
    tp/fp/fn/tn counts (positive class = "same entity").

    Hybrid attach (like the small-side rule for joins): when the
    (conv_id → entity/cluster) maps fit on the driver they are broadcast
    once via ``ray.put`` and looked up map-side — zero shuffles instead of
    four; above the threshold the shuffle-join path runs."""
    ds = candidate_pairs.select_columns(["conv_id_left", "conv_id_right"])
    if entities.count() <= broadcast_threshold:
        ds = _broadcast_attach(ds, entities, gold)
    else:
        ds = _attach(ds, entities, ("conv_id_left", "entity_left"), "entity_id", num_partitions)
        ds = _attach(ds, entities, ("conv_id_right", "entity_right"), "entity_id", num_partitions)
        ds = _attach(ds, gold, ("conv_id_left", "cluster_left"), "cluster_id", num_partitions)
        ds = _attach(ds, gold, ("conv_id_right", "cluster_right"), "cluster_id", num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        pred = np.asarray(batch["entity_left"]) == np.asarray(batch["entity_right"])
        true = np.asarray(batch["cluster_left"]) == np.asarray(batch["cluster_right"])
        tp = int(np.sum(pred & true))
        fp = int(np.sum(pred & ~true))
        fn = int(np.sum(~pred & true))
        tn = int(np.sum(~pred & ~true))
        return pa.table(
            {
                "tp": pa.array([tp], pa.int64()),
                "fp": pa.array([fp], pa.int64()),
                "fn": pa.array([fn], pa.int64()),
                "tn": pa.array([tn], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    totals = {k: 0 for k in ("tp", "fp", "fn", "tn")}
    for row in parts.take_all():  # tiny: one row per batch
        for k in totals:
            totals[k] += row[k]
    return totals


def blocking_report(
    candidate_pairs,
    gold,
    num_partitions: int = 32,
    broadcast_threshold: int = 5_000_000,
) -> dict:
    """Blocking-quality audit: pairs completeness (gold-pair recall of the
    candidate set) and reduction ratio vs the full n·(n−1)/2 search space
    — the standard blocking metrics (Christen, *Data Matching*, ch. 7).

    The reference evaluates its matcher only on the blocked candidate
    table (``src/models/matcher.py:14-24``), so blocking recall silently
    bounds end-to-end recall; this report makes that bound an explicit,
    oracle-checkable number.

    Distributed shape: gold-pair mass from ONE groupby over the gold
    table (per-cluster size k → Σ k·(k−1)/2 via one-row per-batch
    partials); the candidate scan attaches gold labels map-side (same
    hybrid broadcast/bucketed rule as :func:`pairwise_confusion`) and
    reduces each batch to two int64s (matched, total). Nothing
    materializes; the pair table is read once.

    Float fields are raw IEEE quotients of exact int64s (no rounding):
    both engines perform the identical double division / subtraction, so
    oracle parity is bitwise (the ``er_similarity_verify`` precedent).
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Count

    n_records = gold.count()

    sizes = gold.groupby("cluster_id").aggregate(Count(alias_name="k"))

    def gold_mass(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["k"], dtype=np.int64)
        return pa.table({"gp": pa.array([int(np.sum(k * (k - 1) // 2))],
                                        pa.int64())})

    n_gold_pairs = sum(
        r["gp"]
        for r in sizes.map_batches(gold_mass,
                                   batch_format="pyarrow").take_all())

    ds = candidate_pairs.select_columns(["conv_id_left", "conv_id_right"])
    if n_records <= broadcast_threshold:
        from ..util import build_sharded_index_async, sharded_lookup

        grefs = build_sharded_index_async(
            gold.select_columns(["conv_id", "cluster_id"]).materialize(),
            "conv_id", ["cluster_id"], num_shards=8)

        def attach(batch: pa.Table) -> pa.Table:
            gidx = [ray.get(r) for r in grefs]
            return pa.table({
                "cluster_left": sharded_lookup(
                    gidx, batch["conv_id_left"], "cluster_id"),
                "cluster_right": sharded_lookup(
                    gidx, batch["conv_id_right"], "cluster_id"),
            })

        ds = ds.map_batches(attach, batch_format="pyarrow",
                            zero_copy_batch=True)
    else:
        ds = _attach(ds, gold, ("conv_id_left", "cluster_left"),
                     "cluster_id", num_partitions)
        ds = _attach(ds, gold, ("conv_id_right", "cluster_right"),
                     "cluster_id", num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        matched = int(np.sum(np.asarray(batch["cluster_left"])
                             == np.asarray(batch["cluster_right"])))
        return pa.table({
            "matched": pa.array([matched], pa.int64()),
            "total": pa.array([batch.num_rows], pa.int64()),
        })

    n_matched = 0
    n_candidates = 0
    for row in ds.map_batches(partial,
                              batch_format="pyarrow").take_all():
        n_matched += row["matched"]
        n_candidates += row["total"]

    search_space = n_records * (n_records - 1) // 2
    return {
        "n_records": n_records,
        "n_candidates": n_candidates,
        "n_gold_pairs": n_gold_pairs,
        "n_matched": n_matched,
        "pairs_completeness": (n_matched / n_gold_pairs
                               if n_gold_pairs else 0.0),
        "reduction_ratio": (1.0 - (n_candidates / search_space)
                            if search_space else 0.0),
    }


def blocking_sweep(
    conversations,
    gold,
    band_grid: tuple = (8, 16, 32),
    num_perm: int = 64,
    seed: int = 142,
    max_block_size: int = 64,
    num_buckets: int = 64,
    on_oversize: str = "drop",
    num_partitions: int = 32,
    broadcast_threshold: int = 5_000_000,
):
    """Blocking-parameter sweep: re-block the SAME conversations at each
    LSH band count b (r = num_perm/b rows per band) and report the
    :func:`blocking_report` metrics per configuration — the
    candidates-vs-recall tuning table (more bands / fewer rows ⇒ more
    candidates ⇒ higher completeness, lower reduction; Christen ch. 7's
    parameter-selection procedure, and the sweep the reference's fixed
    SIMILAR_CLUSTER_NUM fan-out never exposes).

    One MinHash+pair+report pass per grid point over the conversations'
    precomputed ``thash`` token hashes (no re-tokenization; signatures
    are recomputed per b because band keys hash r-perm slices). The
    same oversize stop-key policy applies at every point, so the table
    reflects what the engine would actually generate. Returns
    ``(report_df, {b: materialized candidate pairs})`` — the exports
    let an oracle re-derive every count and both single-division
    ratios."""
    import pandas as pd

    from .blocking import make_blocks
    from .pairs import generate_pairs

    rows, exports = [], {}
    for nb in band_grid:
        blocks = make_blocks(conversations, num_perm=num_perm,
                             num_bands=nb, seed=seed)
        pairs = generate_pairs(blocks, max_block_size=max_block_size,
                               num_buckets=num_buckets,
                               on_oversize=on_oversize).materialize()
        rep = blocking_report(pairs, gold, num_partitions=num_partitions,
                              broadcast_threshold=broadcast_threshold)
        rows.append({"num_bands": nb, "rows_per_band": num_perm // nb,
                     **rep})
        exports[nb] = pairs
    return pd.DataFrame(rows), exports


def clustering_agreement(
    entities,
    gold,
    num_partitions: int = 32,
    broadcast_threshold: int = 5_000_000,
) -> dict:
    """B³ (B-cubed) precision/recall/F1 (Bagga & Baldwin 1998) and the
    Adjusted Rand Index over the predicted-vs-gold clustering — the two
    standard clustering-agreement metrics beyond candidate-conditioned
    pairwise F1 (:func:`pairwise_confusion` evaluates only on blocked
    pairs; these evaluate the full partition).

    Everything derives from the (entity_id, cluster_id) contingency
    table: one map-side gold attach (hybrid broadcast/bucketed, same
    rule as the confusion), one groupby to exact n_ij counts, then two
    small groupbys OVER the contingency (≪ records) for per-entity /
    per-cluster marginals. ARI's inputs (Σ C(n_ij,2), Σ C(n_i,2),
    Σ C(m_j,2), C(N,2)) are exact int64s, so its float expression is
    computed in a pinned order on both engines — bitwise parity, no
    rounding. The B³ sums (Σ s2_i/n_i) are order-sensitive float sums,
    so P and R carry the house round-at-1e6; F1 is then a pinned
    expression of the two rounded values.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    ds = entities.select_columns(["conv_id", "entity_id"])
    if gold.count() <= broadcast_threshold:
        from ..util import build_sharded_index_async, sharded_lookup

        grefs = build_sharded_index_async(
            gold.select_columns(["conv_id", "cluster_id"]).materialize(),
            "conv_id", ["cluster_id"], num_shards=8)

        def attach(batch: pa.Table) -> pa.Table:
            gidx = [ray.get(r) for r in grefs]
            return pa.table({
                "entity_id": batch["entity_id"],
                "cluster_id": sharded_lookup(
                    gidx, batch["conv_id"], "cluster_id"),
            })

        joined = ds.map_batches(attach, batch_format="pyarrow",
                                zero_copy_batch=True)
    else:
        from ..util import bucketed_join

        joined = bucketed_join(
            ds, gold.select_columns(["conv_id", "cluster_id"]),
            on="conv_id", num_buckets=num_partitions,
        ).select_columns(["entity_id", "cluster_id"])

    def ct_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["entity_id", "cluster_id"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "entity_id": g["entity_id"],
            "cluster_id": g["cluster_id"],
            "nij": pc.cast(g["count_all"], pa.int64()),
        })

    # materialize at the shuffle boundary: the marginal groupbys below
    # must not pipeline into this exchange (CLAUDE.md all-to-all rule)
    ct = (joined.map_batches(ct_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
          .groupby(["entity_id", "cluster_id"])
          .aggregate(Sum("nij", alias_name="nij"))
          .materialize())

    def marginal(key: str):
        """One pass over the contingency: per-`key` (Σ nij², Σ nij),
        then tiny per-batch partials of the B³ float sum + exact pair
        mass + record count."""

        def pre(batch: pa.Table) -> pa.Table:
            n = pc.cast(batch["nij"], pa.int64())
            g = (batch.set_column(
                    batch.schema.get_field_index("nij"), "nij", n)
                 .append_column("s2", pc.multiply(n, n))
                 .group_by([key])
                 .aggregate([("s2", "sum"), ("nij", "sum")]))
            return pa.table({key: g[key], "s2": g["s2_sum"],
                             "size": g["nij_sum"]})

        agg = (ct.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby(key)
               .aggregate(Sum("s2", alias_name="s2"),
                          Sum("size", alias_name="size")))

        def fin(batch: pa.Table) -> pa.Table:
            s2 = np.asarray(batch["s2"], dtype=np.int64)
            sz = np.asarray(batch["size"], dtype=np.int64)
            return pa.table({
                "b3": pa.array([float(np.sum(s2 / sz))], pa.float64()),
                "pairs": pa.array([int(np.sum(sz * (sz - 1) // 2))],
                                  pa.int64()),
                "n": pa.array([int(np.sum(sz))], pa.int64()),
            })

        b3 = pairs = n = 0
        for row in agg.map_batches(fin,
                                   batch_format="pyarrow").take_all():
            b3 += row["b3"]
            pairs += row["pairs"]
            n += row["n"]
        return b3, pairs, n

    bp_sum, si, n_records = marginal("entity_id")
    br_sum, sj, _ = marginal("cluster_id")

    def sij_partial(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["nij"], dtype=np.int64)
        return pa.table({"sij": pa.array([int(np.sum(n * (n - 1) // 2))],
                                         pa.int64())})

    sij = sum(r["sij"] for r in ct.map_batches(
        sij_partial, batch_format="pyarrow").take_all())

    p = float(np.rint(bp_sum / n_records * 1e6) / 1e6)
    r = float(np.rint(br_sum / n_records * 1e6) / 1e6)
    f1 = 2 * p * r / (p + r) if p + r else 0.0

    cn2 = n_records * (n_records - 1) // 2
    exp = (float(si) * float(sj)) / float(cn2)
    den = (si + sj) / 2.0 - exp
    ari = (float(sij) - exp) / den if den else 1.0

    return {
        "n_records": n_records,
        "sum_pairs_pred": si,
        "sum_pairs_gold": sj,
        "sum_pairs_both": sij,
        "ari": ari,
        "bcubed_precision": p,
        "bcubed_recall": r,
        "bcubed_f1": f1,
    }


def score_calibration(
    candidate_pairs,
    gold,
    n_bins: int = 50,
    broadcast_threshold: int = 5_000_000,
    num_partitions: int = 32,
):
    """Score-bin × gold-label counts over the candidate pairs — the
    calibration table behind threshold selection (cumulate from the top
    bin down and every candidate threshold's precision/recall falls
    out). All-integer output: bin = floor(score·n_bins), n_pairs,
    n_match (gold same-cluster) per bin — exact on both engines (one
    float multiply+floor, then pure counts).

    One pass over the pair stream: gold labels attach map-side (hybrid
    broadcast/bucketed, the :func:`pairwise_confusion` rule), each batch
    pre-counts (bin, is_match) with one Arrow group_by, and a tiny
    groupby over ≤ 2·n_bins·n_batches partial rows finishes."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    ds = candidate_pairs.select_columns(
        ["conv_id_left", "conv_id_right", "score"])
    if gold.count() <= broadcast_threshold:
        from ..util import build_sharded_index_async, sharded_lookup

        grefs = build_sharded_index_async(
            gold.select_columns(["conv_id", "cluster_id"]).materialize(),
            "conv_id", ["cluster_id"], num_shards=8)

        def attach(batch: pa.Table) -> pa.Table:
            gidx = [ray.get(r) for r in grefs]
            return pa.table({
                "score": batch["score"],
                "cluster_left": sharded_lookup(
                    gidx, batch["conv_id_left"], "cluster_id"),
                "cluster_right": sharded_lookup(
                    gidx, batch["conv_id_right"], "cluster_id"),
            })

        ds = ds.map_batches(attach, batch_format="pyarrow",
                            zero_copy_batch=True)
    else:
        ds = _attach(ds, gold, ("conv_id_left", "cluster_left"),
                     "cluster_id", num_partitions)
        ds = _attach(ds, gold, ("conv_id_right", "cluster_right"),
                     "cluster_id", num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["score"], np.float64)
        b = np.floor(s * n_bins).astype(np.int64)
        m = (np.asarray(batch["cluster_left"])
             == np.asarray(batch["cluster_right"])).astype(np.int64)
        g = pa.table({"bin": pa.array(b, pa.int64()),
                      "match": pa.array(m, pa.int64()),
                      "one": pa.array(np.ones(len(b), np.int64))}
                     ).group_by("bin").aggregate(
                         [("one", "sum"), ("match", "sum")])
        return pa.table({"bin": g["bin"],
                         "n_pairs": pc.cast(g["one_sum"], pa.int64()),
                         "n_match": pc.cast(g["match_sum"], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bin")
            .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                       Sum("n_match", alias_name="n_match")))


def threshold_sweep(
    candidate_pairs,
    gold,
    n_bins: int = 50,
    broadcast_threshold: int = 5_000_000,
    num_partitions: int = 32,
):
    """Pair-level precision/recall at EVERY candidate threshold t =
    k/n_bins — the operating-point curve behind cutoff selection
    (reference analog: the matcher's single fixed 0.5 cutoff,
    ``src/models/matcher.py:26-42``; this shows what every other cutoff
    would have done before re-running anything).

    Cost model: one pass over the scored pair stream via
    :func:`score_calibration`'s exact-integer bin table (≤ n_bins+1 rows
    leave the cluster), plus one ``groupby(cluster_id)`` count over the
    gold table for the absolute-recall denominator (blocking misses count
    against ``recall_gold``, not just scorer misses). The sweep itself is
    a suffix sum over the bin table on the driver — bounded by n_bins,
    never by data size. All counts are int64; the three ratios are single
    IEEE divisions of exact integers (bit-stable across engines — the
    :func:`match_weights` rule), so no rounding is needed.

    Row k reads: "at threshold score ≥ k/n_bins" (⇔ floor(score·n_bins)
    ≥ k, pure-integer on both engines): predicted-positive pairs, true
    positives, precision, recall within the candidate set, recall against
    all C(n,2) gold pairs."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Count

    cal = score_calibration(candidate_pairs, gold, n_bins=n_bins,
                            broadcast_threshold=broadcast_threshold,
                            num_partitions=num_partitions)
    rows = cal.take_all()  # ≤ n_bins+1 rows by construction

    # absolute-recall denominator: Σ_clusters C(n,2), via per-batch
    # partials over the (tiny) per-cluster count table
    def part(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], dtype=np.int64)
        return pa.table({"p": pa.array([int(np.sum(n * (n - 1) // 2))],
                                       pa.int64())})

    gold_pairs = sum(
        r["p"] for r in gold.groupby("cluster_id")
        .aggregate(Count(alias_name="n"))
        .map_batches(part, batch_format="pyarrow").take_all())

    bins = np.array([int(r["bin"]) for r in rows], dtype=np.int64)
    b_pairs = np.array([int(r["n_pairs"]) for r in rows], dtype=np.int64)
    b_match = np.array([int(r["n_match"]) for r in rows], dtype=np.int64)
    all_match = int(b_match.sum())

    t = np.arange(n_bins, dtype=np.int64)
    mask = bins[None, :] >= t[:, None]          # (n_bins, ≤n_bins+1)
    n_pred = mask @ b_pairs
    n_tp = mask @ b_match

    def ratio(num: np.ndarray, den) -> np.ndarray:
        den_arr = np.broadcast_to(np.asarray(den, np.float64), num.shape)
        out = np.zeros(num.shape, np.float64)
        np.divide(num.astype(np.float64), den_arr, out=out,
                  where=den_arr != 0)
        return out

    return pd.DataFrame({
        "threshold_bin": t,
        "n_pred": n_pred,
        "n_tp": n_tp,
        "precision_t": ratio(n_tp, n_pred),
        "recall_cand": ratio(n_tp, float(all_match)),
        "recall_gold": ratio(n_tp, float(gold_pairs)),
    })


def entity_cohesion(
    candidate_pairs,
    entities,
    threshold: float,
    broadcast_threshold: int = 5_000_000,
    num_partitions: int = 32,
):
    """Per-entity cohesion audit over the candidate pairs: for every
    predicted entity containing at least one scored candidate pair, the
    intra-entity pair count, how many of those pairs are direct edges
    (score ≥ threshold) vs glued together purely by transitive closure
    (score < threshold — "forced merges"), and the min/max intra-entity
    scores. The standard cluster-consistency diagnostic for
    threshold-based ER: a large n_forced with a low min_score flags a
    chained over-merge the pairwise F1 can't localize (the reference
    audits merges only globally via its label stats, stat_ali.py).

    Distributed shape: entity ids attach map-side to both pair sides
    (hybrid broadcast/bucketed — the :func:`pairwise_confusion` rule),
    each batch filters to same-entity rows and pre-aggregates with one
    Arrow group_by, and one small groupby over the per-batch partials
    finishes (Σ counts are exact int64; min/max are order-independent,
    so every float in the output is bitwise-reproducible — no rounding).
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Max, Min, Sum

    ds = candidate_pairs.select_columns(
        ["conv_id_left", "conv_id_right", "score"])
    if entities.count() <= broadcast_threshold:
        from ..util import build_sharded_index_async, sharded_lookup

        erefs = build_sharded_index_async(
            entities.select_columns(["conv_id", "entity_id"]).materialize(),
            "conv_id", ["entity_id"], num_shards=8)

        def attach(batch: pa.Table) -> pa.Table:
            eidx = [ray.get(r) for r in erefs]
            return pa.table({
                "score": batch["score"],
                "entity_left": sharded_lookup(
                    eidx, batch["conv_id_left"], "entity_id"),
                "entity_right": sharded_lookup(
                    eidx, batch["conv_id_right"], "entity_id"),
            })

        ds = ds.map_batches(attach, batch_format="pyarrow",
                            zero_copy_batch=True)
    else:
        ds = _attach(ds, entities, ("conv_id_left", "entity_left"),
                     "entity_id", num_partitions)
        ds = _attach(ds, entities, ("conv_id_right", "entity_right"),
                     "entity_id", num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        same = pc.equal(batch["entity_left"], batch["entity_right"])
        t = batch.filter(same)
        direct = pc.cast(pc.greater_equal(t["score"], threshold), pa.int64())
        g = (pa.table({"entity_id": t["entity_left"],
                       "score": t["score"],
                       "direct": direct})
             .group_by("entity_id")
             .aggregate([("score", "count"), ("direct", "sum"),
                         ("score", "min"), ("score", "max")]))
        return pa.table({
            "entity_id": g["entity_id"],
            "n_pairs": pc.cast(g["score_count"], pa.int64()),
            "n_direct": pc.cast(g["direct_sum"], pa.int64()),
            "min_score": g["score_min"],
            "max_score": g["score_max"],
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("entity_id")
           .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                      Sum("n_direct", alias_name="n_direct"),
                      Min("min_score", alias_name="min_score"),
                      Max("max_score", alias_name="max_score")))

    def fin(batch: pa.Table) -> pa.Table:
        np_ = np.asarray(batch["n_pairs"], np.int64)
        nd = np.asarray(batch["n_direct"], np.int64)
        return pa.table({
            "entity_id": batch["entity_id"],
            "n_pairs": pa.array(np_, pa.int64()),
            "n_direct": pa.array(nd, pa.int64()),
            "n_forced": pa.array(np_ - nd, pa.int64()),
            "min_score": batch["min_score"],
            "max_score": batch["max_score"],
        })

    return agg.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def match_weights(
    candidate_pairs,
    gold,
    cutoffs: dict[str, float],
    broadcast_threshold: int = 5_000_000,
    num_partitions: int = 32,
):
    """Fellegi–Sunter m/u parameter estimation over the candidate pairs:
    for each comparison feature f with agreement cutoff c_f,
    m_f = P(feature ≥ c_f | gold match) and
    u_f = P(feature ≥ c_f | gold non-match) — the agreement-probability
    table behind probabilistic record linkage (Fellegi & Sunter 1969;
    the log2(m/u) match weights fall out of these two columns). With
    gold labels available this is a supervised count, not EM: every
    output is either an exact int64 count or a raw IEEE quotient of two
    exact int64s, so oracle parity is bitwise (no rounding; the log
    itself is left to the consumer precisely because transcendentals
    are not bit-stable across engines).

    One pass over the pair stream: gold labels attach map-side (the
    :func:`pairwise_confusion` hybrid rule), each batch reduces to one
    row per feature (4 int64 counts), and the driver sums |features| ×
    n_batches tiny partials."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    feats = sorted(cutoffs)
    ds = candidate_pairs.select_columns(
        ["conv_id_left", "conv_id_right", *feats])
    if gold.count() <= broadcast_threshold:
        from ..util import build_sharded_index_async, sharded_lookup

        grefs = build_sharded_index_async(
            gold.select_columns(["conv_id", "cluster_id"]).materialize(),
            "conv_id", ["cluster_id"], num_shards=8)

        def attach(batch: pa.Table) -> pa.Table:
            gidx = [ray.get(r) for r in grefs]
            return batch.select(feats).append_column(
                "cluster_left", sharded_lookup(
                    gidx, batch["conv_id_left"], "cluster_id")
            ).append_column(
                "cluster_right", sharded_lookup(
                    gidx, batch["conv_id_right"], "cluster_id"))

        ds = ds.map_batches(attach, batch_format="pyarrow",
                            zero_copy_batch=True)
    else:
        ds = _attach(ds, gold, ("conv_id_left", "cluster_left"),
                     "cluster_id", num_partitions)
        ds = _attach(ds, gold, ("conv_id_right", "cluster_right"),
                     "cluster_id", num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        m = (np.asarray(batch["cluster_left"])
             == np.asarray(batch["cluster_right"]))
        rows = {"feature": [], "n_match": [], "n_unmatch": [],
                "n_agree_match": [], "n_agree_unmatch": []}
        for f in feats:
            a = np.asarray(batch[f], np.float64) >= cutoffs[f]
            rows["feature"].append(f)
            rows["n_match"].append(int(np.sum(m)))
            rows["n_unmatch"].append(int(np.sum(~m)))
            rows["n_agree_match"].append(int(np.sum(a & m)))
            rows["n_agree_unmatch"].append(int(np.sum(a & ~m)))
        return pa.table({
            "feature": pa.array(rows["feature"], pa.string()),
            "n_match": pa.array(rows["n_match"], pa.int64()),
            "n_unmatch": pa.array(rows["n_unmatch"], pa.int64()),
            "n_agree_match": pa.array(rows["n_agree_match"], pa.int64()),
            "n_agree_unmatch": pa.array(rows["n_agree_unmatch"],
                                        pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("feature")
           .aggregate(Sum("n_match", alias_name="n_match"),
                      Sum("n_unmatch", alias_name="n_unmatch"),
                      Sum("n_agree_match", alias_name="n_agree_match"),
                      Sum("n_agree_unmatch",
                          alias_name="n_agree_unmatch")))

    def fin(batch: pa.Table) -> pa.Table:
        nm = np.asarray(batch["n_match"], np.int64)
        nu = np.asarray(batch["n_unmatch"], np.int64)
        am = np.asarray(batch["n_agree_match"], np.int64)
        au = np.asarray(batch["n_agree_unmatch"], np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mp = np.where(nm > 0, am / nm, 0.0)
            up = np.where(nu > 0, au / nu, 0.0)
        return batch.append_column(
            "m_prob", pa.array(mp, pa.float64())
        ).append_column("u_prob", pa.array(up, pa.float64()))

    return agg.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def agreement_patterns(
    candidate_pairs,
    cutoffs: dict[str, float],
):
    """Counts of the 2^F feature-agreement patterns over the candidate
    pairs — the Fellegi–Sunter sufficient statistic (Fellegi & Sunter
    1969): under conditional independence, these ≤ 2^F integers are ALL
    that unsupervised m/u/λ estimation (:func:`em_weights`) needs; no
    gold labels touched. Pattern id packs one bit per feature in sorted
    name order (bit i set ⇔ feature_i ≥ its cutoff).

    One pass over the pair stream, no attach at all: each batch reduces
    to ≤ 2^F (pattern, count) rows via one Arrow group_by, then a tiny
    groupby sums the partials. Output is pure int64 — oracle parity is
    bitwise (DuckDB re-derives every feature from the raw transcripts
    via the er_similarity_verify recipe, then packs the same bits)."""
    import numpy as np
    from ray.data.aggregate import Sum

    feats = sorted(cutoffs)
    ds = candidate_pairs.select_columns(feats)

    def partial(batch: pa.Table) -> pa.Table:
        pat = np.zeros(len(batch), np.int64)
        for i, f in enumerate(feats):
            pat |= (np.asarray(batch[f], np.float64)
                    >= cutoffs[f]).astype(np.int64) << i
        g = pa.table({
            "pattern": pa.array(pat, pa.int64()),
            "one": pa.array(np.ones(len(pat), np.int64)),
        }).group_by("pattern").aggregate([("one", "sum")])
        return pa.table({"pattern": g["pattern"],
                         "n_pairs": pc.cast(g["one_sum"], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("pattern")
            .aggregate(Sum("n_pairs", alias_name="n_pairs")))


def em_weights(
    pattern_counts,
    feats: list[str],
    iters: int = 100,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
):
    """Unsupervised Fellegi–Sunter parameter estimation: EM over the
    :func:`agreement_patterns` table (the Splink-style core — no gold
    labels anywhere). Conditional-independence mixture of two Bernoulli
    products; E-step assigns each pattern a match responsibility, M-step
    re-estimates λ (match prevalence) and per-feature m_f / u_f. The
    entire loop runs on ≤ 2^F integer rows on the driver — the data-size
    work was already done by the one distributed pass that produced the
    counts. Deterministic: fixed init, fixed iteration count, no RNG.

    ``pattern_counts`` is the materialized pattern table (list of dicts
    or DataFrame with columns pattern/n_pairs); ``feats`` gives the bit
    order (sorted feature names, bit i ⇔ feats[i]). Returns one row per
    feature (m_prob / u_prob) plus a ``_lambda`` row carrying the match
    prevalence in both columns. Iterative transcendental-free float math
    — not SQL-expressible, so this op is rows-only by design; accuracy
    is pinned by a planted-mixture pytest instead."""
    import numpy as np
    import pandas as pd

    rows = (pattern_counts.to_dict("records")
            if hasattr(pattern_counts, "to_dict") else list(pattern_counts))
    pats = np.array([int(r["pattern"]) for r in rows], np.int64)
    n = np.array([int(r["n_pairs"]) for r in rows], np.float64)
    F = len(feats)
    a = ((pats[:, None] >> np.arange(F)[None, :]) & 1).astype(np.float64)

    lam, m, u = lam0, np.full(F, m0), np.full(F, u0)
    eps = 1e-12
    for _ in range(iters):
        # E-step in log space for numerical safety at F features
        lm = (a * np.log(np.clip(m, eps, 1 - eps))
              + (1 - a) * np.log(np.clip(1 - m, eps, 1 - eps))).sum(1)
        lu = (a * np.log(np.clip(u, eps, 1 - eps))
              + (1 - a) * np.log(np.clip(1 - u, eps, 1 - eps))).sum(1)
        pm = lam * np.exp(lm)
        pu = (1 - lam) * np.exp(lu)
        w = pm / np.clip(pm + pu, eps, None)
        # M-step over the weighted integer counts
        wm, wu = n * w, n * (1 - w)
        lam = float(wm.sum() / n.sum())
        m = (a * wm[:, None]).sum(0) / np.clip(wm.sum(), eps, None)
        u = (a * wu[:, None]).sum(0) / np.clip(wu.sum(), eps, None)

    return pd.DataFrame({
        "feature": list(feats) + ["_lambda"],
        "m_prob": np.append(m, lam),
        "u_prob": np.append(u, lam),
    })


def fs_weight_table(em_df, eps: float = 1e-12):
    """Turn :func:`em_weights` output into the Fellegi–Sunter log2
    weight table: per feature w_agree = log2(m/u), w_disagree =
    log2((1−m)/(1−u)), plus a ``_prior`` row carrying log2(λ/(1−λ)).
    The transcendentals happen HERE — once, on the driver, over ≤ F+1
    tiny rows — and the resulting doubles are what both the engine and
    the oracle consume, so downstream scoring stays bit-stable (the
    repo's no-transcendentals-in-oracles rule)."""
    import numpy as np
    import pandas as pd

    d = em_df.set_index("feature")
    lam = float(np.clip(d.loc["_lambda", "m_prob"], eps, 1 - eps))
    rows = []
    for f in d.index:
        if f == "_lambda":
            continue
        m = float(np.clip(d.loc[f, "m_prob"], eps, 1 - eps))
        u = float(np.clip(d.loc[f, "u_prob"], eps, 1 - eps))
        rows.append({"feature": f,
                     "w_agree": float(np.log2(m / u)),
                     "w_disagree": float(np.log2((1 - m) / (1 - u)))})
    pr = float(np.log2(lam / (1 - lam)))
    rows.append({"feature": "_prior", "w_agree": pr, "w_disagree": pr})
    return pd.DataFrame(rows)


def fs_scores(
    candidate_pairs,
    weights,
    cutoffs: dict[str, float],
):
    """Per-pair Fellegi–Sunter log-odds over the candidate pairs —
    the full unsupervised probabilistic-record-linkage scoring loop
    (Fellegi & Sunter 1969; the Splink decision rule): log_odds =
    prior + Σ_f (w_agree_f if feature_f ≥ c_f else w_disagree_f),
    with every weight a precomputed double from :func:`fs_weight_table`
    (no transcendental evaluated per pair, by either engine).

    One stateless vectorized pass; the ≤ 2F+1 weight doubles ride the
    closure (plain floats — no broadcast object needed). The sum is
    accumulated in sorted feature order starting from the prior, so an
    oracle writing the identical left-associated expression matches
    bitwise."""
    import numpy as np

    feats = sorted(cutoffs)
    w = weights.set_index("feature")
    wa = {f: float(w.loc[f, "w_agree"]) for f in feats}
    wd = {f: float(w.loc[f, "w_disagree"]) for f in feats}
    prior = float(w.loc["_prior", "w_agree"])
    ds = candidate_pairs.select_columns(
        ["conv_id_left", "conv_id_right", *feats])

    def kern(batch: pa.Table) -> pa.Table:
        lo = np.full(len(batch), prior, np.float64)
        for f in feats:
            a = np.asarray(batch[f], np.float64) >= cutoffs[f]
            lo = lo + np.where(a, wa[f], wd[f])
        return pa.table({
            "conv_id_left": batch["conv_id_left"],
            "conv_id_right": batch["conv_id_right"],
            "log_odds": pa.array(lo, pa.float64()),
        })

    return ds.map_batches(kern, batch_format="pyarrow",
                          zero_copy_batch=True)


def prf(confusion: dict) -> dict:
    """Positive-class precision/recall/F1 (matcher.py:14-24 semantics)."""
    tp, fp, fn = confusion["tp"], confusion["fp"], confusion["fn"]
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, **confusion}
