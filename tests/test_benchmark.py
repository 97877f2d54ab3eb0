"""Labeled-benchmark construction (reference build_ali_dataset parity)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def corpus_dir():
    from ember_ray.synth import SynthConfig, ensure_corpus

    return ensure_corpus(
        SynthConfig(n_clusters=30, max_cluster_size=5,
                    distractors_per_cluster=2, n_singletons=10, seed=142)
    )


@pytest.fixture(scope="module")
def built(ray_session, corpus_dir):
    from ember_ray.pipelines.benchmark import build_labeled_pairs

    return build_labeled_pairs(corpus_dir, num_buckets=8)


def _gold_map(corpus_dir):
    g = pd.read_parquet(f"{corpus_dir}/gold_clusters.parquet")
    return dict(zip(g["conv_id"], g["cluster_id"]))


def test_labels_match_gold(built, corpus_dir):
    g = _gold_map(corpus_dir)
    df = built["all"].to_pandas()
    assert len(df) > 0
    same = df.conv_id_left.map(g) == df.conv_id_right.map(g)
    # label=1 ⇔ same gold cluster (reference label semantics)
    assert (same == (df.label == 1)).all()
    # canonical ordering, no self pairs (U2)
    assert (df.conv_id_left < df.conv_id_right).all()
    # both classes present; negatives dominate (1:3 budget intent)
    assert df.label.sum() > 0 and (df.label == 0).sum() > df.label.sum()


def test_split_cluster_level_disjoint(built, corpus_dir):
    g = _gold_map(corpus_dir)
    df = built["all"].to_pandas()
    core = df[df.split.isin(["train", "val", "test"])].copy()
    # BOTH clusters of a core pair belong to exactly one core split
    # (split-then-generate, build_ali_dataset.py:262-296: the reference
    # generates pairs within each split corpus, so a train negative can
    # never carry a test-cluster record)
    long = pd.concat(
        [
            core[["split"]].assign(cl=core.conv_id_left.map(g)),
            core[["split"]].assign(cl=core.conv_id_right.map(g)),
        ]
    )
    assert (long.groupby("cl")["split"].nunique() == 1).all()
    for name in ("train", "val", "test", "test_rl", "test_cfm", "test_om"):
        sub = built[name].to_pandas()
        assert set(sub["split"].unique()) <= {name}


def test_scenario_semantics(built, corpus_dir):
    """rl/cfm/om membership rules (reference build_datasets,
    build_ali_dataset.py:296-342)."""
    import numpy as np

    from ember_ray.util import stable_hash64

    g = _gold_map(corpus_dir)
    df = built["all"].to_pandas()
    assert len(df[df.split.isin(["test_rl", "test_cfm", "test_om"])]) > 0

    cl_l = df.conv_id_left.map(g).to_numpy().astype(np.int64)
    cl_r = df.conv_id_right.map(g).to_numpy().astype(np.int64)
    om_l = stable_hash64(cl_l, seed=7) % np.uint64(5) == 4
    om_r = stable_hash64(cl_r, seed=7) % np.uint64(5) == 4
    ext_l = stable_hash64(df.conv_id_left.to_numpy(), seed=11) % np.uint64(5) >= 3
    ext_r = stable_hash64(df.conv_id_right.to_numpy(), seed=11) % np.uint64(5) >= 3

    s = df.split.to_numpy()
    # om pairs: both sides in extra clusters; no cross-corpus pairs remain
    assert (om_l[s == "test_om"] & om_r[s == "test_om"]).all()
    assert not (om_l[s != "test_om"] | om_r[s != "test_om"]).any()
    # rl: exactly one extra-record side; cfm: both; core: none
    n_ext = ext_l.astype(int) + ext_r.astype(int)
    assert (n_ext[s == "test_rl"] == 1).all()
    assert (n_ext[s == "test_cfm"] == 2).all()
    core_mask = np.isin(s, ["train", "val", "test"])
    assert (n_ext[core_mask] == 0).all()


@pytest.fixture(scope="module")
def imbalanced(ray_session, corpus_dir, built):
    from ember_ray.pipelines.benchmark import build_imbalanced

    return build_imbalanced(corpus_dir, num_buckets=8, balanced=built)


def test_imbalanced_ratio_and_labels(imbalanced, corpus_dir):
    g = _gold_map(corpus_dir)
    assert len(imbalanced) > 0
    for name, ds in imbalanced.items():
        df = ds.to_pandas()
        n_pos = int((df.label == 1).sum())
        n_neg = int((df.label == 0).sum())
        # exact 1:99 budget (reference IMBALANCE_POS_NEG_SIZE semantics)
        assert n_pos > 0 and n_neg == 99 * n_pos, (name, n_pos, n_neg)
        same = df.conv_id_left.map(g) == df.conv_id_right.map(g)
        assert (same == (df.label == 1)).all()
        assert set(df["split"]) == {name}
        # no duplicate pairs inside a set
        assert not df.duplicated(["conv_id_left", "conv_id_right"]).any()


def test_imbalanced_excludes_train_val(imbalanced, built):
    # test_i must not contain any pair seen in balanced train/val
    # (reference excluded_pairs anti-join, build_ali_dataset.py:313)
    if "test_i" not in imbalanced:
        pytest.skip("corpus too small for test_i")
    seen = built["all"].to_pandas()
    seen = seen[seen.split.isin(["train", "val"])]
    seen_keys = set(zip(seen.conv_id_left, seen.conv_id_right))
    ti = imbalanced["test_i"].to_pandas()
    got = set(zip(ti.conv_id_left, ti.conv_id_right))
    assert not (got & seen_keys)


def test_imbalanced_population_rules(imbalanced, corpus_dir):
    import numpy as np

    from ember_ray.pipelines.benchmark import _ext_flags, _om_flags

    g = _gold_map(corpus_dir)
    for name, ds in imbalanced.items():
        df = ds.to_pandas()
        cl_l = df.conv_id_left.map(g).to_numpy().astype(np.int64)
        cl_r = df.conv_id_right.map(g).to_numpy().astype(np.int64)
        om = _om_flags(cl_l) | _om_flags(cl_r)
        ext_l = _ext_flags(df.conv_id_left.to_numpy())
        ext_r = _ext_flags(df.conv_id_right.to_numpy())
        if name == "test_iom":
            assert (_om_flags(cl_l) & _om_flags(cl_r)).all()
        else:
            assert not om.any()
        if name == "test_i":
            assert not (ext_l | ext_r).any()
        elif name == "test_irl":
            assert ((ext_l.astype(int) + ext_r.astype(int)) == 1).all()
        elif name == "test_icfm":
            assert (ext_l & ext_r).all()


def test_deterministic(ray_session, corpus_dir):
    from ember_ray.pipelines.benchmark import build_labeled_pairs

    a = build_labeled_pairs(corpus_dir, num_buckets=8)["all"].to_pandas()
    b = build_labeled_pairs(corpus_dir, num_buckets=4)["all"].to_pandas()
    key = ["conv_id_left", "conv_id_right"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    # same pairs + labels regardless of parallelism/bucketing
    pd.testing.assert_frame_equal(a[key + ["label"]], b[key + ["label"]])


@pytest.fixture(scope="module")
def ratio_train(ray_session, corpus_dir):
    from ember_ray.pipelines.benchmark import build_ratio_train

    return {k: ds.to_pandas() for k, ds in
            build_ratio_train(corpus_dir, num_buckets=8).items()}


def test_ratio_train_exact_ratios(ratio_train, corpus_dir):
    # reference build_ali_dataset_ratio_train.py:294 — k in [9,19,39,79,99],
    # pos:neg exactly 1:k, total ~constant across ratios
    from ember_ray.pipelines.benchmark import RATIO_TRAIN_KS

    assert set(ratio_train) == {f"ratio_{k + 1}" for k in RATIO_TRAIN_KS}
    g = _gold_map(corpus_dir)
    totals = []
    for k in RATIO_TRAIN_KS:
        df = ratio_train[f"ratio_{k + 1}"]
        n_pos = int((df.label == 1).sum())
        n_neg = int((df.label == 0).sum())
        assert n_pos >= 1 and n_neg == k * n_pos
        totals.append(n_pos + n_neg)
        # labels match gold clusters
        same = df.conv_id_left.map(g).to_numpy() == df.conv_id_right.map(
            g).to_numpy()
        assert (same == (df.label.to_numpy() == 1)).all()
    # total held ~constant (within one (1+k) granule of the target)
    assert max(totals) - min(totals) <= max(RATIO_TRAIN_KS) + 1


def test_ratio_train_split_stable_across_ratios(ratio_train):
    # 7:1:2 split is a content hash of the pair: a pair present at two
    # ratios must land in the SAME split (mirrors the reference's fixed
    # seed); splits are pair-level and exhaustive
    seen = {}
    for name, df in ratio_train.items():
        assert set(df.split.unique()) <= {"train", "val", "test"}
        for key, split in zip(
                zip(df.conv_id_left, df.conv_id_right), df.split):
            assert seen.setdefault(key, split) == split
