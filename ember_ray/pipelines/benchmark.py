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

from ..functions.similarity import jaccard_py
from ..stages.assemble import assemble_conversations
from ..stages.blocking import make_blocks
from ..stages.tokenize import add_tokens
from ..util import bucketed_group_map, bucketed_join, stable_hash64

POS_NEG_RATIO = 3       # reference POS_NEG_SIZE 1:3 (build_ali_dataset.py:28-30)
PAIRS_PER_CLUSTER = 40  # reference NUM_PAIRS (build_ali_dataset.py:32)


def _select_hard_and_random(df: pd.DataFrame, budget: int,
                            ascending: bool) -> pd.DataFrame:
    """Reference selection semantics (build_ali_dataset.py:102-112,188-198):
    sort by similarity, keep the hardest ⌈budget/2⌉, fill the rest in
    content-hash order (deterministic stand-in for df.sample)."""
    if len(df) <= budget:
        return df
    df = df.sort_values(
        ["jaccard", "conv_id_left", "conv_id_right"], ascending=ascending,
        kind="mergesort",
    )
    n_hard = -(-budget // 2)
    hard = df.head(n_hard)
    rest = df.iloc[n_hard:]
    key = rest["conv_id_left"] + "|" + rest["conv_id_right"]
    order = np.argsort(stable_hash64(key.to_numpy()), kind="stable")
    rand = rest.iloc[order[: budget - n_hard]]
    return pd.concat([hard, rand])


def _pairs_in_groups(df: pd.DataFrame, group_col: str, budget_per_group: int,
                     hard_ascending: bool, same_cluster: bool,
                     max_group_size: int = 256) -> pd.DataFrame:
    """All unordered within-group pairs + Jaccard + hard/random selection.
    For negatives (same_cluster=False) only cross-cluster pairs survive.
    Groups above ``max_group_size`` are skipped (stop-key skew cap, the
    reference's SIMILAR_CLUSTER_NUM=12 fan-out analog)."""
    out = []
    for _, g in df.groupby(group_col, sort=False):
        ids = g["conv_id"].to_numpy()
        toks = g["tokens"].to_numpy()
        clus = g["cluster_id"].to_numpy()
        n = len(ids)
        if n < 2 or n > max_group_size:
            continue
        i, j = np.triu_indices(n, k=1)
        if same_cluster:
            keep = clus[i] == clus[j]
        else:
            keep = clus[i] != clus[j]
        i, j = i[keep], j[keep]
        if not len(i):
            continue
        swap = ids[i] > ids[j]
        li, rj = np.where(swap, j, i), np.where(swap, i, j)
        jac = np.fromiter(
            (jaccard_py(toks[a], toks[b]) for a, b in zip(li, rj)),
            np.float64, len(li),
        )
        p = pd.DataFrame(
            {
                "conv_id_left": ids[li],
                "conv_id_right": ids[rj],
                "cluster_id_left": clus[li],
                "cluster_id_right": clus[rj],
                "jaccard": jac,
            }
        )
        out.append(
            _select_hard_and_random(p, budget_per_group, ascending=hard_ascending)
        )
    if not out:
        return pd.DataFrame(
            {
                "conv_id_left": pd.array([], "str"),
                "conv_id_right": pd.array([], "str"),
                "cluster_id_left": pd.array([], "int64"),
                "cluster_id_right": pd.array([], "int64"),
                "jaccard": pd.array([], "float64"),
            }
        )
    return pd.concat(out, ignore_index=True)


def build_labeled_pairs(corpus_dir: str, num_buckets: int = 64,
                        max_block_size: int = 64, seed: int = 142):
    """corpus dir → dict of train/val/test labeled-pair Datasets.

    Columns: conv_id_left/right, label (1 within gold cluster, 0 across),
    jaccard, split (reference pair-table shape, data/ali/README.md:62-77,
    minus the duplicated payload columns — join text on demand)."""
    import os

    import ray.data as rd

    convs = add_tokens(
        assemble_conversations(
            rd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet")),
            num_buckets=num_buckets,
        )
    )
    gold = rd.read_parquet(os.path.join(corpus_dir, "gold_clusters.parquet"))

    # attach gold cluster ids (zero-copy broadcast index, ray.put once)
    import ray

    from ..util import broadcast_lookup, build_broadcast_index

    gref = ray.put(
        build_broadcast_index(gold.to_pandas(), "conv_id", ["cluster_id"])
    )

    def tag_cluster(batch: pa.Table) -> pa.Table:
        idx = ray.get(gref)
        return batch.append_column(
            "cluster_id", broadcast_lookup(idx, batch["conv_id"], "cluster_id")
        )

    tagged = convs.select_columns(["conv_id", "tokens"]).map_batches(
        tag_cluster, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

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
    # deterministic pseudo-random co-grouping — hash(conv_id) buckets of
    # ~2·PAIRS_PER_CLUSTER rows — then cross-cluster pairs within a bucket
    n_convs = tagged.count()
    n_rand_buckets = max(1, n_convs // (2 * PAIRS_PER_CLUSTER))
    rand_neg = bucketed_group_map(
        tagged,
        key="conv_id",
        fn=lambda df: _pairs_in_groups(
            df.assign(__g=0), "__g", POS_NEG_RATIO * PAIRS_PER_CLUSTER,
            hard_ascending=False, same_cluster=False,
        ),
        num_buckets=n_rand_buckets,
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
        train/val/test on the LEFT cluster hash (clusters never straddle);
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

    core_h = stable_hash64(cl_l) % np.uint64(10)
    core = np.where(core_h < 7, "train", np.where(core_h < 8, "val", "test"))

    both_om = om_l & om_r
    any_om = om_l | om_r
    n_ext = ext_l.astype(np.int64) + ext_r.astype(np.int64)
    out = core
    out = np.where(n_ext == 1, "test_rl", out)
    out = np.where(n_ext == 2, "test_cfm", out)
    out = np.where(any_om, "drop", out)   # crosses the om/main boundary
    out = np.where(both_om, "test_om", out)
    return out


def _dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(["conv_id_left", "conv_id_right"])
