"""Labeled-benchmark construction (reference §3.1 parity):
``scripts/construction/build_ali_dataset.py`` re-expressed Ray-Data-first.

The reference builds labeled pair datasets from a corpus with gold
clusters:
  * positive pairs — within-gold-cluster cross join, Jaccard ascending,
    hardest half + random half, ``label=1``
    (``build_ali_dataset.py:60-130``);
  * negative pairs — across similar blocks, Jaccard descending, hardest
    half + random half, ``label=0``, pos:neg budget 1:3
    (``build_ali_dataset.py:133-217``, POS_NEG_SIZE ``:28-30``);
  * cluster-level train/val/test split so clusters never straddle splits
    (``build_ali_dataset.py:262-296``).

Ray-native re-expression:
  * per-cluster loops → ``bucketed_group_map`` keyed on ``cluster_id``
    (positives) / LSH ``block_key`` (negative candidates);
  * the reference's top-12-similar-cluster blocking for negatives → LSH
    band co-occurrence across different gold clusters (same hard-negative
    intent: near-miss pairs, not uniform random);
  * ``df.sample`` / ``np.random.choice`` randomness → content-hash order
    (``stable_hash64`` of the pair key) so "random half" is deterministic
    across runs and cluster sizes (SURVEY.md §4 determinism rule);
  * 7:1:2 split → ``hash(cluster_id) % 10`` ∈ {0-6 | 7 | 8-9}.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.assemble import assemble_conversations
from ..stages.blocking import make_blocks
from ..util import bucketed_group_map, bucketed_join, stable_hash64

POS_NEG_RATIO = 3       # reference POS_NEG_SIZE 1:3 (build_ali_dataset.py:28-30)
PAIRS_PER_CLUSTER = 40  # reference NUM_PAIRS (build_ali_dataset.py:32)


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id_left": pd.array([], "str"),
            "conv_id_right": pd.array([], "str"),
            "cluster_id_left": pd.array([], "int64"),
            "cluster_id_right": pd.array([], "int64"),
            "jaccard": pd.array([], "float64"),
        }
    )


def _ragged_gather(h: np.ndarray, offsets: np.ndarray, rows: np.ndarray):
    """Gather ragged rows (by index) from a flat array → (flat, offsets)."""
    cnt = offsets[rows + 1] - offsets[rows]
    out_off = np.concatenate([[0], np.cumsum(cnt)])
    total = int(out_off[-1])
    idx = np.repeat(offsets[rows], cnt) + (
        np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], cnt)
    )
    return h[idx], out_off


def _pairs_in_groups(df: pd.DataFrame, group_col: str, budget_per_group: int,
                     hard_ascending: bool, same_cluster: bool,
                     max_group_size: int = 256) -> pd.DataFrame:
    """All unordered within-group pairs + Jaccard + hard/random selection,
    vectorized over the whole bucket (VERDICT r1: the old version looped
    ``df.groupby`` per group and called python-set ``jaccard_py`` per pair).

    For negatives (same_cluster=False) only cross-cluster pairs survive.
    Groups above ``max_group_size`` are skipped (stop-key skew cap, the
    reference's SIMILAR_CLUSTER_NUM=12 fan-out analog).

    Selection semantics (build_ali_dataset.py:102-112,188-198): per group,
    sort by (jaccard, id_left, id_right) — a TOTAL order, so the result is
    independent of row arrival order — keep the hardest ⌈budget/2⌉, fill
    the rest in content-hash order (deterministic stand-in for df.sample).
    """
    from ..functions.minhash import token_hashes
    from ..functions.similarity import batch_jaccard_hashes

    if len(df) < 2:
        return _empty_pairs()

    codes, _ = pd.factorize(df[group_col], sort=False)
    order = np.argsort(codes, kind="stable")
    ids_all = df["conv_id"].to_numpy()[order]
    clus_all = df["cluster_id"].to_numpy()[order].astype(np.int64)
    toks_all = df["tokens"].to_numpy()[order]
    codes_s = codes[order]
    bounds = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1], True])

    # pair index generation: one numpy triu per group (cheap — O(groups)
    # python calls, all heavy work on the pair arrays below)
    li_parts, rj_parts, grp_parts = [], [], []
    for gi, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        n = e - s
        if n < 2 or n > max_group_size:
            continue
        i, j = np.triu_indices(n, k=1)
        i += s
        j += s
        keep = (clus_all[i] == clus_all[j]) if same_cluster else (clus_all[i] != clus_all[j])
        i, j = i[keep], j[keep]
        if not len(i):
            continue
        swap = ids_all[i] > ids_all[j]
        li_parts.append(np.where(swap, j, i))
        rj_parts.append(np.where(swap, i, j))
        grp_parts.append(np.full(len(i), gi, np.int64))
    if not li_parts:
        return _empty_pairs()
    li = np.concatenate(li_parts)
    rj = np.concatenate(rj_parts)
    grp = np.concatenate(grp_parts)

    # hash every token once per bucket (vectorized xxhash), ragged-gather
    # each pair side, one vectorized Jaccard over all pairs
    ta = pa.array(list(toks_all), pa.list_(pa.string()))
    h, offs = token_hashes(ta)
    offs = np.asarray(offs, np.int64)
    lh, lo = _ragged_gather(h, offs, li)
    rh, ro = _ragged_gather(h, offs, rj)
    jac = batch_jaccard_hashes(lh, lo, rh, ro)

    # per-group hard/random selection on numpy arrays. String ids are
    # mapped to bucket-level sort ranks (relative order preserved) so a
    # descending total order is a lexsort over negated ranks.
    _, rank_all = np.unique(ids_all, return_inverse=True)
    rank_l, rank_r = rank_all[li], rank_all[rj]
    row_hash = stable_hash64(ids_all)
    pair_hash = (row_hash[li] * np.uint64(0x9E3779B97F4A7C15)) ^ row_hash[rj]

    keep_mask = np.zeros(len(li), bool)
    gb = np.flatnonzero(np.r_[True, grp[1:] != grp[:-1], True])
    n_hard = -(-budget_per_group // 2)
    for s, e in zip(gb[:-1], gb[1:]):
        m = e - s
        if m <= budget_per_group:
            keep_mask[s:e] = True
            continue
        if hard_ascending:
            o = np.lexsort((rank_r[s:e], rank_l[s:e], jac[s:e]))
        else:
            o = np.lexsort((-rank_r[s:e], -rank_l[s:e], -jac[s:e]))
        keep_mask[s + o[:n_hard]] = True
        rest = o[n_hard:]
        ro_ = np.argsort(pair_hash[s:e][rest], kind="stable")
        keep_mask[s + rest[ro_[: budget_per_group - n_hard]]] = True

    k = np.flatnonzero(keep_mask)
    return pd.DataFrame(
        {
            "conv_id_left": ids_all[li[k]],
            "conv_id_right": ids_all[rj[k]],
            "cluster_id_left": clus_all[li[k]],
            "cluster_id_right": clus_all[rj[k]],
            "jaccard": jac[k],
        }
    )


def _tagged_corpus(corpus_dir: str, num_buckets: int):
    """Assembled conversations with tokens + gold ``cluster_id`` attached
    (zero-copy broadcast index, ray.put once). Materialized — shared by
    the balanced and imbalanced builders."""
    import os

    import ray
    import ray.data as rd

    from ..util import broadcast_lookup, build_broadcast_index

    convs = assemble_conversations(
        rd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet")),
        num_buckets=num_buckets,
        tokenizer="word",
    )
    gold = rd.read_parquet(os.path.join(corpus_dir, "gold_clusters.parquet"))
    gref = ray.put(
        build_broadcast_index(gold.to_pandas(), "conv_id", ["cluster_id"])
    )

    def tag_cluster(batch: pa.Table) -> pa.Table:
        idx = ray.get(gref)
        return batch.append_column(
            "cluster_id", broadcast_lookup(idx, batch["conv_id"], "cluster_id")
        )

    return convs.select_columns(["conv_id", "tokens"]).map_batches(
        tag_cluster, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()


def build_labeled_pairs(corpus_dir: str, num_buckets: int = 64,
                        max_block_size: int = 64, seed: int = 142):
    """corpus dir → dict of train/val/test labeled-pair Datasets.

    Columns: conv_id_left/right, label (1 within gold cluster, 0 across),
    jaccard, split (reference pair-table shape, data/ali/README.md:62-77,
    minus the duplicated payload columns — join text on demand)."""
    tagged = _tagged_corpus(corpus_dir, num_buckets)

    # positives: within-cluster pairs, hardest = LOWEST jaccard first
    pos = bucketed_group_map(
        tagged,
        key="cluster_id",
        fn=lambda df: _pairs_in_groups(
            df, "cluster_id", PAIRS_PER_CLUSTER, hard_ascending=True,
            same_cluster=True,
        ),
        num_buckets=num_buckets,
    )

    # negatives: LSH-block co-occurrence across clusters, hardest = HIGHEST
    # jaccard first, 3× the positive budget
    blocks = make_blocks(tagged, num_perm=64, num_bands=16, seed=seed)
    with_payload = bucketed_join(
        blocks, tagged, on="conv_id", num_buckets=num_buckets
    )
    hard_neg = bucketed_group_map(
        with_payload,
        key="block_key",
        fn=lambda df: _dedup_pairs(
            _pairs_in_groups(
                df, "block_key", POS_NEG_RATIO * PAIRS_PER_CLUSTER,
                hard_ascending=False, same_cluster=False,
            )
        ),
        num_buckets=num_buckets,
    )

    # random negatives (reference's random half, build_ali_dataset.py:198):
    # deterministic pseudo-random co-grouping — hash(conv_id) groups of
    # ~2·PAIRS_PER_CLUSTER rows — then cross-cluster pairs within a group
    # (capped exchange fan-out; see _random_cogroups)
    n_convs = tagged.count()
    rand_neg = _random_cogroups(
        tagged, n_convs, 2 * PAIRS_PER_CLUSTER,
        POS_NEG_RATIO * PAIRS_PER_CLUSTER,
    )

    # cross-block/source dedup on canonical pair key
    neg = bucketed_group_map(
        hard_neg.union(rand_neg), key="conv_id_left", fn=_dedup_pairs,
        num_buckets=num_buckets,
    )

    def finish(label: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            split = _scenario_split(batch)
            return pa.table(
                {
                    "conv_id_left": batch["conv_id_left"],
                    "conv_id_right": batch["conv_id_right"],
                    "jaccard": batch["jaccard"],
                    "label": pa.array(np.full(n, label, np.int64)),
                    "split": pa.array(split, pa.string()),
                }
            )

        return fn

    pos_l = pos.map_batches(finish(1), batch_format="pyarrow", zero_copy_batch=True)
    neg_l = neg.map_batches(finish(0), batch_format="pyarrow", zero_copy_batch=True)
    all_pairs = pos_l.union(neg_l).filter(expr="split != 'drop'").materialize()
    out = {
        name: all_pairs.filter(expr=f"split == '{name}'")
        for name in ("train", "val", "test", "test_rl", "test_cfm", "test_om")
    }
    out["all"] = all_pairs
    return out


def _scenario_split(batch: pa.Table) -> np.ndarray:
    """Per-pair scenario assignment (reference build_datasets semantics,
    build_ali_dataset.py:262-342), content-hash-derived so it is a pure
    function of ids — no driver-held membership sets:

      * 20% of clusters are EXTRA clusters → pairs wholly inside them are
        ``test_om`` (open matching: unseen clusters);
      * within main clusters, 40% of records are EXTRA records
        (get_extra_records_ids 60/40 split): a main×extra pair is
        ``test_rl`` (new record vs known corpus), extra×extra is
        ``test_cfm`` (new records only);
      * main×main pairs form the core corpus, split 7:1:2 into
        train/val/test on the cluster hash of BOTH sides; a pair whose two
        clusters hash to different core splits is dropped — the reference
        splits clusters first and generates pairs within each split corpus
        (build_ali_dataset.py:262-296), so cross-split pairs never exist
        there (and a train negative must not carry a test-cluster record);
      * pairs crossing the main/om corpora are dropped — the reference
        never generates them (separate build_record_pairs calls per
        corpus).
    """
    cl_l = np.asarray(batch["cluster_id_left"]).astype(np.int64)
    cl_r = np.asarray(batch["cluster_id_right"]).astype(np.int64)
    om_l = stable_hash64(cl_l, seed=7) % np.uint64(5) == 4
    om_r = stable_hash64(cl_r, seed=7) % np.uint64(5) == 4
    ext_l = stable_hash64(batch["conv_id_left"], seed=11) % np.uint64(5) >= 3
    ext_r = stable_hash64(batch["conv_id_right"], seed=11) % np.uint64(5) >= 3

    core_l = _core_split_of(cl_l)
    core_r = _core_split_of(cl_r)

    both_om = om_l & om_r
    any_om = om_l | om_r
    n_ext = ext_l.astype(np.int64) + ext_r.astype(np.int64)
    out = np.where(core_l == core_r, core_l, "drop")  # split-then-generate
    out = np.where(n_ext == 1, "test_rl", out)
    out = np.where(n_ext == 2, "test_cfm", out)
    out = np.where(any_om, "drop", out)   # crosses the om/main boundary
    out = np.where(both_om, "test_om", out)
    return out


def _core_split_of(cluster_ids: np.ndarray) -> np.ndarray:
    """Pure content-hash 7:1:2 cluster-level core split."""
    h = stable_hash64(cluster_ids) % np.uint64(10)
    return np.where(h < 7, "train", np.where(h < 8, "val", "test"))


def _dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(["conv_id_left", "conv_id_right"])


MAX_EXCHANGE_BUCKETS = 256  # cap on reduce-task fan-out per exchange


def _random_cogroups(ds, n_rows: int, group_rows: int, budget: int):
    """Deterministic pseudo-random co-grouping → cross-cluster negative
    pairs (the reference's ``df.sample`` analog): assign each conversation
    a hash group of ~``group_rows`` rows, exchange on the GROUP id with a
    CAPPED bucket count (many groups per reduce bucket), and emit
    cross-cluster pairs within each group.

    The previous shape used one exchange bucket per ~64-row group — at
    1.8M rows that is ~28k ``num_returns`` per split task and ~28k reduce
    tasks (ADVICE r2): Ray chokes far below the target scale. Group
    membership is unchanged (``stable_hash64(conv_id) % n_groups`` —
    exactly what ``bucket_of`` computed), so the output pairs are
    identical; only the transport bucketing is capped.
    """
    n_groups = max(1, n_rows // group_rows)

    def tag(batch: pa.Table) -> pa.Table:
        g = (stable_hash64(batch["conv_id"]) % np.uint64(n_groups)).astype(
            np.int64)
        return batch.append_column("__g", pa.array(g, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_map(
        tagged,
        key="__g",
        fn=lambda df: _pairs_in_groups(
            df, "__g", budget, hard_ascending=False, same_cluster=False),
        num_buckets=min(n_groups, MAX_EXCHANGE_BUCKETS),
    )


# ------------------------------------------------------ imbalanced (1:99)
IMBALANCE_RATIO = 99  # reference IMBALANCE_POS_NEG_SIZE = (500, 99*500)
                      # (build_ali_dataset.py:30)


def _add_pair_hash(batch: pa.Table) -> pa.Table:
    """Content hash of the unordered pair — the deterministic analog of the
    reference's ``df.sample``: sort by ``__ph`` + ``limit`` is a seeded
    uniform draw that is stable across runs and parallelism."""
    hl = stable_hash64(batch["conv_id_left"])
    hr = stable_hash64(batch["conv_id_right"])
    ph = (hl * np.uint64(0x9E3779B97F4A7C15)) ^ hr
    return batch.append_column("__ph", pa.array(ph, pa.uint64()))


def _ext_flags(conv_ids) -> np.ndarray:
    return stable_hash64(conv_ids, seed=11) % np.uint64(5) >= 3


def _om_flags(cluster_ids: np.ndarray) -> np.ndarray:
    return stable_hash64(cluster_ids, seed=7) % np.uint64(5) == 4


def build_imbalanced(corpus_dir: str, num_buckets: int = 64,
                     balanced: dict | None = None,
                     ratio: int = IMBALANCE_RATIO):
    """Four 1:99 imbalanced test sets — the reference's headline "reality"
    scenario (test_i/irl/icfm/iom, build_ali_dataset.py:311-327,
    IMBALANCE_POS_NEG_SIZE at :30, counts data/ali/README.md:156-161).

    Populations mirror the reference's split-then-generate corpora:
      * ``test_i``   — main clusters, main records; pairs present in the
        balanced train/val splits are EXCLUDED (the reference's
        ``excluded_pairs`` anti-join, build_ali_dataset.py:313);
      * ``test_irl`` — main clusters, pairs with exactly one extra-record
        side (new record vs known corpus);
      * ``test_icfm``— main clusters, extra records only;
      * ``test_iom`` — extra (om) clusters.

    Sizes scale with the corpus while holding the ratio exact:
    ``n_pos = min(avail_pos, avail_neg // ratio)``, ``n_neg = ratio·n_pos``
    (the reference's fixed 500/49,500 at its corpus size). Selection is the
    reference's final ``df.sample(total_num)`` re-expressed as first-N in
    content-hash order — deterministic across runs and parallelism.
    """
    import ray
    import ray.data as rd

    from ..util import broadcast_lookup, build_broadcast_index

    tagged = _tagged_corpus(corpus_dir, num_buckets)

    def add_flags(batch: pa.Table) -> pa.Table:
        # int8 flags: Ray's filter-expr parser has no boolean literals
        om = _om_flags(np.asarray(batch["cluster_id"]).astype(np.int64))
        ext = np.asarray(_ext_flags(batch["conv_id"]))
        return batch.append_column(
            "__om", pa.array(om.astype(np.int8))
        ).append_column("__ext", pa.array(ext.astype(np.int8)))

    flagged = tagged.map_batches(
        add_flags, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # train/val exclusion index for test_i: the balanced train/val pair
    # sets are budget-bounded (≈NUM_PAIRS·(1+ratio)/cluster), so a
    # zero-copy broadcast index is the right shape; at extreme scale this
    # switches to a bucketed anti-join on the pair key.
    excl_ref = None
    if balanced is not None:
        tv = balanced["all"].filter(
            expr="split == 'train' or split == 'val'"
        ).select_columns(["conv_id_left", "conv_id_right"]).to_pandas()
        if len(tv):  # empty train/val (tiny corpora) ⇒ nothing to exclude
            tv["__pk"] = tv["conv_id_left"] + "|" + tv["conv_id_right"]
            tv["__one"] = np.int8(1)
            excl_ref = ray.put(build_broadcast_index(tv[["__pk", "__one"]],
                                                     "__pk", ["__one"]))

    def exclude_seen(ds):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = ray.get(excl_ref)
            pk = pc.binary_join_element_wise(
                batch["conv_id_left"], batch["conv_id_right"], "|")
            hit = broadcast_lookup(idx, pk.combine_chunks() if isinstance(pk, pa.ChunkedArray) else pk, "__one")
            return batch.filter(pc.is_null(hit))

        return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    def one_ext_side(ds):
        def fn(batch: pa.Table) -> pa.Table:
            el = _ext_flags(batch["conv_id_left"])
            er = _ext_flags(batch["conv_id_right"])
            return batch.filter(pa.array(el != er))

        return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    add_pair_hash = _add_pair_hash

    out: dict[str, rd.Dataset] = {}
    for name in ("test_i", "test_irl", "test_icfm", "test_iom"):
        if name == "test_iom":
            pop = flagged.filter(expr="__om == 1")
        elif name == "test_icfm":
            pop = flagged.filter(expr="__om == 0 and __ext == 1")
        elif name == "test_i":
            pop = flagged.filter(expr="__om == 0 and __ext == 0")
        else:  # test_irl: main clusters, both record kinds
            pop = flagged.filter(expr="__om == 0")
        pop = pop.drop_columns(["__om", "__ext"]).materialize()
        n_pop = pop.count()
        if n_pop < 2:
            continue

        pos = bucketed_group_map(
            pop, key="cluster_id",
            fn=lambda df: _pairs_in_groups(
                df, "cluster_id", 1 << 40, hard_ascending=True,
                same_cluster=True),
            num_buckets=num_buckets,
        )
        # random cross-cluster co-grouping: ~64-row hash groups ⇒ up to
        # ~2k candidate pairs per group, each unordered pair generated at
        # most once (both endpoints must hash to the same group); exchange
        # fan-out capped (see _random_cogroups)
        neg = _random_cogroups(pop, n_pop, 64, 1 << 40)
        if name == "test_irl":
            pos, neg = one_ext_side(pos), one_ext_side(neg)
        if name == "test_i" and excl_ref is not None:
            pos, neg = exclude_seen(pos), exclude_seen(neg)

        pos = pos.map_batches(add_pair_hash, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        neg = neg.map_batches(add_pair_hash, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        n_pos = min(pos.count(), neg.count() // ratio)
        if n_pos == 0:
            continue

        def finish(ds, n, label):
            sel = ds.sort("__ph").limit(n)

            def fn(batch: pa.Table) -> pa.Table:
                m = batch.num_rows
                return pa.table(
                    {
                        "conv_id_left": batch["conv_id_left"],
                        "conv_id_right": batch["conv_id_right"],
                        "jaccard": batch["jaccard"],
                        "label": pa.array(np.full(m, label, np.int64)),
                        "split": pa.array([name] * m, pa.string()),
                    }
                )

            return sel.map_batches(fn, batch_format="pyarrow",
                                   zero_copy_batch=True)

        out[name] = finish(pos, n_pos, 1).union(
            finish(neg, ratio * n_pos, 0)).materialize()
    return out


# ----------------------------------------------- ratio-varying train sets
RATIO_TRAIN_KS = (9, 19, 39, 79, 99)  # reference build_ali_dataset_ratio_
                                      # train.py:294 ``for k in [9,19,39,
                                      # 79,99]`` → pos:neg = 1:k


def build_ratio_train(corpus_dir: str, num_buckets: int = 64,
                      ratios: tuple = RATIO_TRAIN_KS):
    """Train datasets at varying pos:neg ratios — the reference's second
    constructor (``build_ali_dataset_ratio_train.py:294-331``): for each
    ``k`` a 1:k dataset of ~equal TOTAL size, split 7:1:2 into
    train/val/test at the PAIR level (the reference's back-to-back
    ``train_test_split(test_size=0.2)`` then ``(1/8)``).

    Ray-Data shape: positives and negatives are generated ONCE
    (cluster-bucketed cross join / capped random co-grouping — the same
    distributed generators as ``build_imbalanced``), materialized with a
    content pair hash; each ratio then re-slices the SAME candidate tables
    by hash order, so k ratios cost one pair-generation pass, not k.

    Determinism: selection is first-N in ``__ph`` order (the reference's
    seeded ``df.sample``); the 7:1:2 split is a second, independent
    content hash (seed 23) of the unordered pair — stable across runs,
    parallelism, and ratio (a pair that appears at two ratios lands in
    the same split, which also mirrors the reference's fixed seed 142).

    Total size is held ~constant across ratios (reference: fixed 10,000):
    ``T = min_k (1+k)·min(avail_pos, avail_neg // k)`` scaled to the
    corpus, then per ratio ``n_pos = T // (1+k)``, ``n_neg = k·n_pos``
    (ratio exact, total within one pair of T).
    """
    import ray.data as rd

    tagged = _tagged_corpus(corpus_dir, num_buckets)

    def main_only(batch: pa.Table) -> pa.Table:
        om = _om_flags(np.asarray(batch["cluster_id"]).astype(np.int64))
        ext = np.asarray(_ext_flags(batch["conv_id"]))
        return batch.filter(pa.array(~om & ~ext))

    pop = tagged.map_batches(
        main_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_pop = pop.count()
    if n_pop < 2:
        return {}

    # each side sorted by content hash ONCE (not once per ratio): all k
    # ratios are prefix slices of the same sorted candidate table
    pos = bucketed_group_map(
        pop, key="cluster_id",
        fn=lambda df: _pairs_in_groups(
            df, "cluster_id", 1 << 40, hard_ascending=True,
            same_cluster=True),
        num_buckets=num_buckets,
    ).map_batches(_add_pair_hash, batch_format="pyarrow",
                  zero_copy_batch=True).sort("__ph").materialize()
    neg = _random_cogroups(pop, n_pop, 64, 1 << 40).map_batches(
        _add_pair_hash, batch_format="pyarrow",
        zero_copy_batch=True).sort("__ph").materialize()
    avail_pos, avail_neg = pos.count(), neg.count()
    if avail_pos == 0 or avail_neg == 0:
        return {}
    total = min((1 + k) * min(avail_pos, avail_neg // k) for k in ratios)
    if total == 0:
        return {}

    def finish(ds, n, label):
        sel = ds.limit(n)

        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            pk = pc.binary_join_element_wise(
                batch["conv_id_left"], batch["conv_id_right"], "|")
            h = stable_hash64(
                pk.combine_chunks() if isinstance(pk, pa.ChunkedArray)
                else pk, seed=23) % np.uint64(10)
            split = np.where(h < 7, "train", np.where(h < 8, "val", "test"))
            m = batch.num_rows
            return pa.table(
                {
                    "conv_id_left": batch["conv_id_left"],
                    "conv_id_right": batch["conv_id_right"],
                    "jaccard": batch["jaccard"],
                    "label": pa.array(np.full(m, label, np.int64)),
                    "split": pa.array(split.tolist(), pa.string()),
                }
            )

        return sel.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)

    out: dict[str, rd.Dataset] = {}
    for k in ratios:
        n_pos_k = max(1, total // (1 + k))
        n_neg_k = k * n_pos_k
        if n_pos_k > avail_pos or n_neg_k > avail_neg:
            continue
        out[f"ratio_{k + 1}"] = finish(pos, n_pos_k, 1).union(
            finish(neg, n_neg_k, 0)).materialize()
    return out
