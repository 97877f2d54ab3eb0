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
    df["cl"] = df.conv_id_left.map(g)
    # a LEFT cluster appears in exactly one split (cluster-level split,
    # build_ali_dataset.py:262-296 semantics)
    assert (df.groupby("cl")["split"].nunique() == 1).all()
    for name in ("train", "val", "test"):
        sub = built[name].to_pandas()
        assert set(sub["split"].unique()) <= {name}


def test_deterministic(ray_session, corpus_dir):
    from ember_ray.pipelines.benchmark import build_labeled_pairs

    a = build_labeled_pairs(corpus_dir, num_buckets=8)["all"].to_pandas()
    b = build_labeled_pairs(corpus_dir, num_buckets=4)["all"].to_pandas()
    key = ["conv_id_left", "conv_id_right"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    # same pairs + labels regardless of parallelism/bucketing
    pd.testing.assert_frame_equal(a[key + ["label"]], b[key + ["label"]])
