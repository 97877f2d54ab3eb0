"""The flagship entity-resolution pipeline (SURVEY.md §3.4 lifecycle).

read transcripts → assemble conversations (stable turn_idx order) →
tokenize → MinHash-LSH blocking (salt-free band keys + stop-key cap) →
pair-gen (canonical ordering + cross-band dedup) → scoring actor pool
(Jaccard / Jaro-Winkler / Levenshtein / TF-IDF-cosine; broadcast IDF) →
threshold → distributed min-label transitive clustering → entity ids →
pairwise F1 vs gold at the same blocking key.

Every wide step and its shuffle key is documented in SURVEY.md §7.2. With a
``Checkpointer`` the expensive stages persist per-partition Parquet +
lineage manifests and a re-run skips completed work (scoring resumes at
partition granularity).
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa

from ..stages.assemble import assemble_conversations
from ..stages.blocking import make_blocks
from ..stages.cluster import assign_entities, connected_components
from ..stages.evaluate import pairwise_confusion, prf
from ..stages.pairs import attach_sides, generate_pairs
from ..stages.scoring import build_idf, edges_from_scores, score_pairs
from ..state.checkpoint import Checkpointer, fingerprint
from ..util import bucket_of


@dataclass(frozen=True)
class ERConfig:
    num_perm: int = 64
    num_bands: int = 16
    max_block_size: int = 64
    on_oversize: str = "drop"  # skew policy for hot block keys: "drop"
                               # (stop-key) or "salt" (deterministic
                               # sub-block split; see generate_pairs)
    threshold: float = 0.7  # empirically the pos/neg score gap midpoint on
                            # the synthetic corpus sits at ~0.69 (neg p100
                            # 0.66, pos p0 0.73); a config knob, like the
                            # reference's decision threshold on matcher
                            # probability
    use_idf: bool = True
    weights: dict | None = None
    scorer_concurrency: int | tuple = 4
    scorer_batch_size: int = 2048
    num_buckets: int = 64          # hash buckets for bucketed group maps
    num_partitions: int = 32       # hash-join partitions
    score_parts: int = 16          # partition-level checkpoint granularity
    cc_driver_threshold: int = 8_000_000  # edges; below → driver union-find
                                   # (≈130 MB of string edges on a 128 GB
                                   # node), above → distributed min-label
    tokenizer: str = "word"        # "word" | "cjk" (see stages.tokenize)
    blocker: str = "minhash_lsh"   # registry name (registry.py §2.11);
    scorer: str = "pair_features"  # non-default names run the generic
                                   # attach+score path (no fused blocks /
                                   # pre-warmed pool specializations)
    seed: int = 142

    def fp(self, *extra) -> str:
        return fingerprint(asdict(self), *extra)


def _as_dataset(transcripts):
    import ray.data as rd

    if isinstance(transcripts, str):
        path = (
            os.path.join(transcripts, "transcripts.parquet")
            if os.path.isdir(transcripts)
            else transcripts
        )
        return rd.read_parquet(path)
    return transcripts


def run_er(
    transcripts,
    cfg: ERConfig = ERConfig(),
    gold=None,
    checkpointer: Checkpointer | None = None,
    input_fp: str = "",
):
    """Run the full ER pipeline.

    Args:
        transcripts: Dataset, parquet path, or corpus dir containing
            ``transcripts.parquet``.
        gold: optional GOLD_CLUSTERS Dataset (or corpus dir implies one).
        checkpointer: enables per-stage + per-partition resume.
        input_fp: content fingerprint of the input (lineage key).

    Returns dict with conversations / candidate_pairs / scored / entities
    Datasets and (if gold) ``metrics``.
    """
    import ray
    import ray.data as rd

    if isinstance(transcripts, str) and os.path.isdir(transcripts) and gold is None:
        gp = os.path.join(transcripts, "gold_clusters.parquet")
        if os.path.exists(gp):
            gold = rd.read_parquet(gp)
    ds = None if isinstance(transcripts, str) else _as_dataset(transcripts)

    # scorer pool FIRST: actor process spawn + module imports (~3-4 core-s
    # each, measured ~20 s wall for 16 actors under load) overlap the
    # assemble stage; refs are shipped later via load_scorer_pool. The
    # actors are num_cpus=0 and idle until then. Only used on the
    # broadcast-attach path; killed unused on the giant-corpus join path.
    from ..registry import DEFAULT_BLOCKER, DEFAULT_SCORER, resolve
    from ..stages.scoring import (load_scorer_pool, score_with_pool,
                                  start_scorer_pool)

    # §2.11 pluggable stages: non-default registry names run the GENERIC
    # path — custom blocker output pairs via the string pair-gen, custom
    # scorer classes via attach_sides + score_pairs actor pools. The
    # specialized fused-read / pre-warmed-pool machinery assumes the
    # built-in stage contracts, so it only engages on the default names.
    generic = (cfg.blocker != DEFAULT_BLOCKER or cfg.scorer != DEFAULT_SCORER)
    scorer_cls = resolve("scorer", cfg.scorer) if generic else None
    blocker_fn = (resolve("blocker", cfg.blocker)
                  if cfg.blocker != DEFAULT_BLOCKER else None)

    if generic:
        pool = None
    else:
        n_actors = max(2, int(ray.cluster_resources().get("CPU", 4)))
        pool = start_scorer_pool(n_actors, weights=cfg.weights,
                                 batch_size=cfg.scorer_batch_size)

    base_fp = cfg.fp(input_fp)
    timings: dict[str, float] = {}
    from ..state.stats import drop_counts

    drops_before = drop_counts()  # global cumulative; report run delta

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        if os.environ.get("GRAFT_SCORE_PROF"):
            import sys

            print(f"STAGEPROF {name} end={time.time():.2f} "
                  f"dur={timings[name]}", file=sys.stderr, flush=True)
        return out

    # --- assemble + tokenize (checkpointed together: "conversations") ------
    # path inputs assemble via the fused parquet read+split exchange (the
    # decoded turns never round-trip plasma as whole read-job blocks)
    assemble_input = transcripts if isinstance(transcripts, str) else ds
    if isinstance(assemble_input, str) and os.path.isdir(assemble_input):
        assemble_input = os.path.join(assemble_input, "transcripts.parquet")

    def compute_convs():
        # tokenize fused into the assembly reduce (one pass, one Data job);
        # token_hashes: emit per-conv sorted-unique hash lists (thash/ttf)
        # so blocking / IDF / scorer never re-tokenize or re-hash; bands:
        # MinHash-LSH band keys in the same pass, so pair-gen needs no
        # make_blocks job over the materialized conversations at all
        return assemble_conversations(
            assemble_input, num_buckets=cfg.num_buckets,
            tokenizer=cfg.tokenizer, token_hashes=True)

    if checkpointer:
        convs = timed("assemble", lambda: checkpointer.run(
            "conversations", base_fp, compute_convs).materialize())
    else:
        convs = timed("assemble", lambda: compute_convs().materialize())
    n_convs = convs.count()

    # --- overlapped side work (driver constants off the critical path) -----
    # 1. attach-side broadcast index: built by a background Ray task over
    #    the materialized conversation blocks while blocking/pair-gen runs
    #    (was ~13s of serial driver gather at 450k convs — the largest
    #    cpu-count-independent term in the scaling-efficiency gap).
    # 2. IDF table: task-parallel partials + one combine task; the combine
    #    ObjectRef goes straight to the scorer actors, whose ray.get
    #    blocks until it resolves — zero serial driver time.
    from ..stages.pairs import build_side_index_async
    from ..stages.scoring import build_idf_async

    # index payload: the MAX_SIM_CHARS text prefix (sim_prefix_prepare —
    # JW/Lev read nothing past it; full transcripts would be ~7× the
    # bytes) + the precomputed thash/ttf hash lists, so the scorer never
    # tokenizes, hashes, or per-side-sorts (measured: tokenize was 31%
    # and the per-side sorts ~half of the remaining token-kernel cost).
    # Falls back to text-only when resuming an old tokens-schema
    # checkpoint.
    from ..stages.pairs import sim_prefix_prepare

    conv_sch = convs.schema()
    has_thash = (not generic and conv_sch is not None
                 and "thash" in conv_sch.names)
    side_cols = ("text", "thash", "ttf") if has_thash else ("text",)
    # prefix-truncate text ONLY when thash/ttf ride along (the scorer then
    # never tokenizes); on the text-only fallback (old-schema checkpoint
    # resume, or a REGISTRY scorer that reads raw text) the scorer
    # re-tokenizes the attached text, so it must stay full-length or
    # jaccard/tfidf silently drift (ADVICE r3 #2).
    side_index_ref = (
        build_side_index_async(convs, columns=side_cols,
                               prepare_fn=sim_prefix_prepare if has_thash
                               else None)
        if n_convs <= ATTACH_BROADCAST_THRESHOLD
        else None
    )

    idf_ref = build_idf_async(convs, num_docs=n_convs) if cfg.use_idf else None

    # 3. ship the (still-resolving) build refs to the pre-spawned scorer
    #    pool: each actor's load() blocks on them INSIDE the actor, then
    #    prewarms (page-fault + gather-storm + kernel warm-up), all
    #    overlapped with blocking + pair-gen. On the giant-corpus
    #    bucketed-join path the pool is not loaded and killed below.
    if pool is not None:
        if side_index_ref is not None:
            load_scorer_pool(pool, idf_ref=idf_ref,
                             shard_refs=side_index_ref)
        else:
            for a in pool:
                ray.kill(a)
            pool = None

    # --- blocking + pair generation (checkpointed: "pairs") ----------------
    def compute_pairs():
        # hashed path: the pair exchanges run on uint64
        # stable_hash64(conv_id) keys (16 B/pair); strings are resolved at
        # score time from the sharded index (collision-checked at build).
        # With precomputed band keys on the conversations, BLOCKS is just
        # raw explode tasks chained straight into the exchange splits —
        # no make_blocks Data job, no barrier (vs. Ray-Data shuffles,
        # which DO need the staging barrier — see er.compute_pairs r1
        # note); fallback recomputes bands for old-schema checkpoints
        import ray.data as rd

        if blocker_fn is not None:  # registry blocker → string pair path
            return generate_pairs(
                blocker_fn(convs, cfg), max_block_size=cfg.max_block_size,
                num_buckets=cfg.num_buckets, on_oversize=cfg.on_oversize,
            )
        conv_sch2 = convs.schema()
        if conv_sch2 is not None and "thash" in conv_sch2.names:
            from ..stages.blocking import make_blocks_task
            from ..util import _cached_remote

            mb = _cached_remote(make_blocks_task)
            blocks = rd.from_arrow_refs(
                [mb.remote(r, cfg.num_perm, cfg.num_bands, cfg.seed)
                 for r in convs.to_arrow_refs()])
        else:
            blocks = make_blocks(
                convs, num_perm=cfg.num_perm, num_bands=cfg.num_bands,
                seed=cfg.seed, hashed=True,
            ).materialize()
        return generate_pairs(
            blocks, max_block_size=cfg.max_block_size,
            num_buckets=cfg.num_buckets, on_oversize=cfg.on_oversize,
        )

    # barrier between pair-gen and scoring: measured FASTER than fusing
    # them into one lazy chain (fused, the scorer pool idles while the
    # pair shuffle runs, then ramps late; see SURVEY §7.2b barrier rule)
    if checkpointer:
        pairs = timed("pairs", lambda: checkpointer.run(
            "pairs", base_fp, compute_pairs))
    else:
        pairs = timed("pairs", lambda: compute_pairs().materialize())
    scored = timed("score", lambda: _score_stage(
        pairs, convs, cfg, idf_ref, checkpointer, base_fp,
        side_index_ref=side_index_ref, pool=pool, scorer_cls=scorer_cls,
    ).materialize())  # consumed by edges + metrics + callers
    if pool is not None:  # free the actor processes before downstream stages
        for a in pool:
            ray.kill(a)

    # --- threshold → edges → transitive clustering (fused: thresholding
    # + node hashing run inside raw tasks over the scored blocks) ----------
    from ..stages.cluster import connected_components_from_scored

    comps = timed("cluster", lambda: connected_components_from_scored(
        scored, cfg.threshold, num_buckets=cfg.num_buckets,
        num_partitions=cfg.num_partitions,
        driver_threshold=cfg.cc_driver_threshold,
        # mid-closure resume (SURVEY §7.3): on the distributed path every
        # min-label round checkpoints its per-bucket label tables
        checkpointer=checkpointer, ckpt_fp=base_fp if checkpointer else None,
    ))
    entities = assign_entities(convs, comps, num_partitions=cfg.num_partitions)

    # the scored table carries the full candidate-pair set — expose and
    # evaluate from it so the (possibly lazy/fused) pair chain is never
    # re-executed
    candidate_pairs = scored.select_columns(["conv_id_left", "conv_id_right"])
    # oversize-block observability (VERDICT r3 #4): per-stage counts of
    # hot-key blocks handled by the drop/salt policy during THIS run —
    # a mis-tuned max_block_size shows up here, never as silent loss
    drops_after = drop_counts()
    oversize = {}
    for stage_name, e in drops_after.items():
        b0 = drops_before.get(stage_name, {})
        db = e["blocks"] - b0.get("blocks", 0)
        dr = e["rows"] - b0.get("rows", 0)
        if db:
            oversize[stage_name] = {"blocks": db, "rows": dr,
                                    "policy": e["policy"]}
    out = {
        "conversations": convs,
        "candidate_pairs": candidate_pairs,
        "scored": scored,
        "entities": entities,
        "timings": timings,
        "oversize_stats": oversize,
    }
    if gold is not None:
        entities = timed("entities", lambda: entities.materialize())
        out["entities"] = entities
        conf = timed("eval", lambda: pairwise_confusion(
            candidate_pairs, entities, gold, num_partitions=cfg.num_partitions
        ))
        out["metrics"] = prf(conf)
    return out


ATTACH_BROADCAST_THRESHOLD = 8_000_000  # rows; above → bucketed join path.
# Sized for a 128 GB node: the sharded index holds the 128-char prefix +
# thash/ttf ≈ 2 KB/conversation, built distributed (build_side_index_async)
# and read zero-copy from plasma — 8M conversations ≈ 16 GB of shards
# shared across all workers, no per-task copies. The join path beyond it
# is for genuinely cluster-scale corpora where even the compact index
# exceeds a node's store; note it materializes per-PAIR payloads through
# the bucket exchange (~6× the per-conversation bytes at avg pair degree
# 5-6 — measured OutOfDisk at 22M pairs on this box), so its next
# frontier is fusing scoring into the bucket merge. Measured at 960k
# clusters / 6.9M convs: the broadcast path completes where the join
# path exhausts store + spill.


def _score_stage(pairs, convs, cfg: ERConfig, idf_ref, checkpointer, base_fp,
                 side_index_ref=None, pool=None, scorer_cls=None):
    """Scoring with content-hash partition-level resume.

    The partition of a pair is ``stable_hash(conv_id_left|conv_id_right)
    % score_parts`` — recomputable from content, so a resumed run (or a run
    at different parallelism) derives identical partitions without carrying
    a column through checkpoints (SURVEY.md §7.3 fingerprint rule).
    """
    import ray.data as rd

    # giant-corpus join path (no broadcast index, default scorer): ship
    # the SAME compact payload the broadcast index holds — the
    # MAX_SIM_CHARS text prefix plus the prehashed thash/ttf lists,
    # binary-packed so they ride the Acero bucket joins (pack_hash_list)
    # — instead of full conversation text. At the 960k-cluster corpus
    # full text is ~900 B avg × 2 sides × 22M pairs ≈ 40 GB through two
    # exchanges (the measured single-node OutOfDisk); the compact payload
    # is ~7× smaller and the scorer skips re-tokenization entirely.
    # Registry scorers keep full text (they may read it raw — ADVICE r3
    # #2), as does the old-schema (no thash) checkpoint-resume fallback.
    conv_sch3 = convs.schema()
    compact_join = (
        scorer_cls is None and side_index_ref is None
        and conv_sch3 is not None
        and "thash" in conv_sch3.names and "ttf" in conv_sch3.names
    )
    if compact_join:
        import pyarrow.compute as pc

        from ..functions.similarity import MAX_SIM_CHARS
        from ..stages.pairs import pack_hash_list

        def _compact(batch: pa.Table) -> pa.Table:
            return pa.table({
                "conv_id": batch["conv_id"],
                "text": pc.utf8_slice_codeunits(
                    batch["text"], 0, MAX_SIM_CHARS),
                "thashb": pack_hash_list(batch["thash"], np.uint64),
                "ttfb": pack_hash_list(batch["ttf"], np.int32),
            })

        side_src = convs.select_columns(
            ["conv_id", "text", "thash", "ttf"]).map_batches(
            _compact, batch_format="pyarrow", zero_copy_batch=True)
        attach_cols = ("text", "thashb", "ttfb")
    else:
        side_src, attach_cols = convs, ("text",)

    def attach_and_score(p):
        if pool is not None:  # pre-warmed raw actor pool (attach + score)
            from ..stages.scoring import score_with_pool

            return score_with_pool(p, pool)
        if compact_join:
            # fused attach+score: the scorer runs INSIDE the second
            # bucket join's reduce task (bucketed_join post hook), so
            # the per-pair side payloads never enter the object store —
            # only (ids, features, score) rows do. This is what lets the
            # join path survive corpora whose per-pair payload mass
            # exceeds store + spill (the 960k OutOfDisk).
            from ..stages.scoring import make_fused_scorer

            return attach_sides(
                p, side_src, num_partitions=cfg.num_partitions,
                columns=attach_cols,
                broadcast_threshold=ATTACH_BROADCAST_THRESHOLD,
                prebuilt_index_ref=side_index_ref,
                post=make_fused_scorer(idf_ref=idf_ref, weights=cfg.weights,
                                       batch_size=cfg.scorer_batch_size))
        with_sides = attach_sides(p, side_src,
                                  num_partitions=cfg.num_partitions,
                                  columns=attach_cols,
                                  broadcast_threshold=ATTACH_BROADCAST_THRESHOLD,
                                  prebuilt_index_ref=side_index_ref)
        return score_pairs(
            with_sides,
            idf_ref=idf_ref,
            weights=cfg.weights,
            concurrency=cfg.scorer_concurrency,
            batch_size=cfg.scorer_batch_size,
            scorer_cls=scorer_cls,
        )

    if not checkpointer:
        return attach_and_score(pairs)

    stage, P = "score", cfg.score_parts
    # "score-v2": the partition scheme (hl*golden ^ hr content mix) is part
    # of the checkpoint identity — versioning the fingerprint makes partial
    # checkpoints written under the OLD bucket_of(left|right) scheme miss
    # cleanly instead of resuming against a different part mapping, which
    # would silently drop/duplicate scored pairs (ADVICE r3 #1).
    fp = fingerprint("score-v2", base_fp)
    done = checkpointer.completed_parts(stage, fp, P)
    missing = sorted(set(range(P)) - done)
    for p in done:
        checkpointer.hits[stage] = checkpointer.hits.get(stage, 0) + 1

    if missing:
        t0 = time.monotonic()
        missing_arr = np.array(missing, np.int64)

        def _pair_part(batch: pa.Table) -> np.ndarray:
            # content-hash partition id, derivable at any parallelism AND
            # from either representation: an orientation-insensitive mix
            # of the two stable_hash64(conv_id) values — hl/hr pairs carry
            # them already (hl < hr by construction); scored string pairs
            # (possibly swapped to lexicographic order) re-derive the same
            # {lo, hi} set by hashing the ids
            from ..util import stable_hash64

            if "hl" in batch.schema.names:
                lo = batch["hl"].to_numpy(zero_copy_only=False)
                hi = batch["hr"].to_numpy(zero_copy_only=False)
            else:
                a = stable_hash64(batch["conv_id_left"])
                b = stable_hash64(batch["conv_id_right"])
                lo, hi = np.minimum(a, b), np.maximum(a, b)
            mix = lo * np.uint64(0x9E3779B97F4A7C15) ^ hi
            return (mix % np.uint64(P)).astype(np.int64)

        import pyarrow.compute as pc_mod

        def tag_and_filter(batch: pa.Table) -> pa.Table:
            batch = batch.append_column(
                "part", pa.array(_pair_part(batch), pa.int64()))
            return batch.filter(
                pc_mod.is_in(batch["part"], pa.array(missing_arr)))

        subset = pairs.map_batches(
            tag_and_filter, batch_format="pyarrow", zero_copy_batch=True
        ).drop_columns(["part"])
        scored_sub = attach_and_score(subset)

        def retag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "part", pa.array(_pair_part(batch), pa.int64())
            )

        tmp = os.path.join(checkpointer.stage_dir(stage, fp) + ".run", "")
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        scored_sub.map_batches(
            retag, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(tmp, partition_cols=["part"])
        wall = time.monotonic() - t0
        for p in missing:
            checkpointer.misses[stage] = checkpointer.misses.get(stage, 0) + 1
            pdir = os.path.join(tmp, f"part={p}")
            if not os.path.exists(pdir):  # empty partition: commit empty dir
                os.makedirs(pdir, exist_ok=True)
            rows = _dir_num_rows(pdir)
            checkpointer.commit_part(
                stage, fp, p, pdir, row_count=rows,
                wall_s=wall / max(1, len(missing)), pairs_scored=rows,
            )
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    import glob as _glob

    files = [
        f
        for d in checkpointer.part_data_dirs(stage, fp, P)
        for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
        if _dir_num_rows(d) > 0
    ]
    if not files:
        from ..schema import SCORED_PAIRS

        return rd.from_arrow(SCORED_PAIRS.empty_table())
    out = rd.read_parquet(files)
    if "part" in out.schema().names:  # hive dir name may re-infer the column
        out = out.drop_columns(["part"])
    return out


def _dir_num_rows(d: str) -> int:
    import glob

    import pyarrow.parquet as pq

    n = 0
    for f in glob.glob(os.path.join(d, "*.parquet")):
        n += pq.read_metadata(f).num_rows
    return n
