"""BM25 keyword search: scores vs a driver-side Python recompute of the
same formula over the same tokenizer output, plus the empty-trailing-doc
segment-count regression."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _reference_bm25(texts, query, k):
    from ember_ray.functions.text import tokenize_array
    from ember_ray.pipelines.search import B, K1

    toks = tokenize_array(pa.chunked_array([pa.array(texts)])
                          .combine_chunks()).to_pylist()
    terms = query.split()
    n = len(toks)
    dls = [len(t) for t in toks]
    avgdl = sum(dls) / n
    idf = []
    for term in terms:
        df = sum(1 for t in toks if term in t)
        idf.append(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
    scored = []
    for i, t in enumerate(toks):
        raw = 0.0
        norm = K1 * (1.0 - B + B * dls[i] / avgdl)
        for j, term in enumerate(terms):
            tf = t.count(term)
            raw += idf[j] * (tf * (K1 + 1.0)) / (tf + norm)
        if raw > 0.0:
            scored.append((i, np.rint(raw * 1e6) / 1e6))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def test_bm25_matches_python_recompute(ray_session):
    from ember_ray.pipelines.search import DEFAULT_QUERY, bm25_topk

    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    texts = docs["text"].to_pylist()
    ids = docs["doc_id"].to_pylist()
    want = [(ids[i], s) for i, s in
            _reference_bm25(texts, DEFAULT_QUERY, 10)]
    got = bm25_topk(SF_DIR).to_pandas()
    assert list(zip(got["doc_id"], got["score"])) == want
    assert len(got) == 10 and got["score"].iloc[0] > 0


def test_tf_matrix_handles_empty_trailing_doc(ray_session):
    """A batch whose LAST doc normalizes to zero tokens must not steal
    the previous doc's final token (the reduceat clamp failure mode)."""
    import os
    import tempfile

    from ember_ray.pipelines.search import bm25_topk

    with tempfile.TemporaryDirectory() as d:
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["hash join order hash",
                              "join order planning", "..!?  "]),
        })
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = bm25_topk(d, k=3).to_pandas()
        want = [(1, 2, 3)[i] for i, _ in
                _reference_bm25(t["text"].to_pylist(), "hash join order", 3)]
        assert got["doc_id"].tolist() == want
        # doc 1 contains every query term twice-or-once; doc 3 is empty
        assert got["doc_id"].iloc[0] == 1 and 3 not in got["doc_id"].values


def test_bm25_multi_first_query_matches_single(ray_session):
    """query_id 0 of the batched pass must reproduce bm25_topk exactly
    (same terms, same corpus stats, same rounded-score ordering)."""
    from ember_ray.pipelines.search import bm25_multi, bm25_topk

    sf = "/root/testdata/sf0.001"
    multi = bm25_multi(sf, k=5).to_pandas()
    single = (bm25_topk(sf, k=5).to_pandas()
              .sort_values(["score", "doc_id"], ascending=[False, True])
              .reset_index(drop=True))
    q0 = (multi[multi.query_id == 0][["doc_id", "score"]]
          .reset_index(drop=True))
    assert len(q0) == len(single) > 0
    assert (q0["doc_id"].values == single["doc_id"].values).all()
    assert (q0["score"].values == single["score"].values).all()
    # every query returns k rows (corpus large enough) with its own ranking
    assert set(multi["query_id"]) == {0, 1, 2}
    assert (multi.groupby("query_id").size() <= 5).all()
