"""ANN suite: exact-vs-approximate recall gates and determinism.

The approximate paths (sign-sketch LSH, IVF coarse quantizer) are
rows-only at the oracle gate (the bucket probe has no SQL form; the
verify-stage oracles recompute cosine + top-k over exported candidates),
so their candidate-generation quality is gated here instead."""

import pandas as pd

SF_DIR = "/root/testdata/sf0.001"
K = 10


def _recall(exact: pd.DataFrame, approx: pd.DataFrame) -> float:
    hits = tot = 0
    for qid, g in exact.groupby("query_id"):
        want = set(g["vec_id"])
        got = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(want & got)
        tot += len(want)
    return hits / tot


def test_lsh_recall_vs_exact(ray_session):
    from ember_ray.pipelines.ann import ann_topk, ann_topk_lsh

    exact = ann_topk(SF_DIR, k=K).to_pandas()
    approx = ann_topk_lsh(SF_DIR, k=K).to_pandas()
    assert _recall(exact, approx) >= 0.6


def test_ivf_recall_vs_exact(ray_session):
    from ember_ray.pipelines.ann import ann_topk, ann_topk_ivf

    exact = ann_topk(SF_DIR, k=K).to_pandas()
    approx = ann_topk_ivf(SF_DIR, k=K).to_pandas()
    assert _recall(exact, approx) >= 0.6


def test_ivf_deterministic(ray_session):
    from ember_ray.pipelines.ann import ann_topk_ivf

    a = ann_topk_ivf(SF_DIR, k=K).to_pandas()
    b = ann_topk_ivf(SF_DIR, k=K).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_ivf_full_probe_equals_exact(ray_session):
    """With n_probe == n_lists the quantizer prunes nothing, so the IVF
    path must reproduce the exact top-k bitwise — isolates any probe-path
    bug from genuine recall loss."""
    from ember_ray.pipelines.ann import ann_topk, ann_topk_ivf

    exact = ann_topk(SF_DIR, k=K).to_pandas()
    full = ann_topk_ivf(SF_DIR, k=K, n_lists=8, n_probe=8).to_pandas()
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), full.reset_index(drop=True))


def test_ann_topk_filtered_paths_agree(ray_session):
    """Every hit must satisfy the predicate, and the broadcast-membership
    path must agree exactly with the bucketed semi-join path
    (broadcast_threshold=0 forces the big-side branch)."""
    import pyarrow.parquet as pq

    from ember_ray.pipelines.ann import ann_topk_filtered

    sf = "/root/testdata/sf0.001"
    a = (ann_topk_filtered(sf).to_pandas()
         .sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    langs = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
    en = set(langs.loc[langs["lang"] == "en", "doc_id"])
    assert set(a["vec_id"]) <= en
    assert a.groupby("query_id").size().max() <= 10

    b = (ann_topk_filtered(sf, broadcast_threshold=0).to_pandas()
         .sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    assert a.equals(b)
