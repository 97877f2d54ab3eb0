"""Keyword search over the documents table: distributed BM25 top-k.

Extension beyond the reference (whose retrieval is embedding-based —
`src/models/vision_matcher.py` towers); a 100 TB curation pipeline needs
lexical search for contamination screens, boilerplate lookup and
eval-set leakage checks. Scale shape:

* one STATS pass — per-batch partials of (n_docs, Σdoc_len, per-term
  document frequency), a fixed-width row per batch; the driver folds
  them into the BM25 constants (idf per term, avgdl),
* one SCORE pass — constants broadcast, per-batch vectorized tf via
  flat-token equality masks + ``np.add.reduceat`` over list offsets,
  local top-k per batch, global ``sort().limit(k)`` over ≤ k rows per
  batch. The token stream is never shuffled; the driver never sees more
  than the stats rows and the final k.

BM25 (Robertson/Sparck Jones; the Lucene-standard variant):
``score(d) = Σ_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
             · tf/(tf + k1·(1 - b + b·dl/avgdl)) · (k1 + 1)``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

DEFAULT_QUERY = "hash join order"
K1, B = 1.2, 0.75


def bm25_topk(sf_dir: str, query: str = DEFAULT_QUERY, k: int = 10):
    """Top-k documents for ``query`` by BM25, deterministically ordered
    by (rounded score DESC, doc_id ASC). Scores are rounded with the
    shared rint recipe (scale 1e6) on both engine sides."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..functions.text import tokenize_array

    terms = [t for t in query.split() if t]
    m = len(terms)
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def _tf_matrix(toks: pa.ListArray):
        """(n_docs_in_batch × m) term-frequency matrix + doc lengths.

        Counted with bincount over a doc-index vector rather than
        ``np.add.reduceat`` — reduceat mis-assigns the final element when
        a batch's trailing doc is empty (duplicate end offsets clamp into
        the previous segment)."""
        offsets = np.asarray(toks.offsets, np.int64)
        lengths = np.diff(offsets)
        dl = lengths.astype(np.float64)
        nrows = len(dl)
        tf = np.zeros((nrows, m), np.float64)
        if offsets[-1] > offsets[0]:
            vals = toks.values
            # doc index for every token position in the covered region
            # (offsets need not start at 0 for sliced arrays)
            docidx = np.repeat(np.arange(nrows, dtype=np.int64), lengths)
            base = offsets[0]
            for j, term in enumerate(terms):
                eq = np.asarray(pc.equal(vals, term).fill_null(False))
                hit = eq[base:offsets[-1]]
                if hit.any():
                    tf[:, j] = np.bincount(docidx[hit], minlength=nrows)
        return tf, dl

    def _stats(t: pa.Table) -> pa.Table:
        tf, dl = _tf_matrix(tokenize_array(t["text"]))
        return pa.table({
            "n_docs": pa.array([len(dl)], pa.int64()),
            "dl_sum": pa.array([int(dl.sum())], pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).astype(np.int64).tolist()],
                           pa.list_(pa.int64())),
        })

    stats = ds.map_batches(_stats, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096).to_pandas()
    n_docs = float(stats["n_docs"].sum())
    dl_sum = float(stats["dl_sum"].sum())
    df = np.sum(np.stack(stats["df"].to_numpy()), axis=0).astype(np.float64)
    avgdl = dl_sum / n_docs if n_docs else 1.0
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    consts = ray.put((idf, avgdl))

    def _score(t: pa.Table) -> pa.Table:
        idf_, avgdl_ = ray.get(consts)
        tf, dl = _tf_matrix(tokenize_array(t["text"]))
        norm = K1 * (1.0 - B + B * dl / avgdl_)
        # accumulate term-by-term in query order (same order as the SQL
        # oracle's left-to-right + chain) for float parity
        raw = np.zeros(len(dl), np.float64)
        for j in range(m):
            raw += idf_[j] * (tf[:, j] * (K1 + 1.0)) / (tf[:, j] + norm)
        keep = raw > 0.0
        scale = 1e6
        out = pa.table({
            "doc_id": pa.array(np.asarray(t["doc_id"])[keep], pa.int64()),
            "score": pa.array(np.rint(raw[keep] * scale) / scale),
        })
        if out.num_rows > k:  # local top-k under the SAME total order
            order = pc.sort_indices(out, sort_keys=[
                ("score", "descending"), ("doc_id", "ascending")])
            out = out.take(order[:k])
        return out

    return (ds.map_batches(_score, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096)
            .sort(["score", "doc_id"], descending=[True, False]).limit(k))


MULTI_QUERIES = ("hash join order", "sort merge table", "spark stream window")


def bm25_multi(sf_dir: str, queries: tuple = MULTI_QUERIES, k: int = 5):
    """Batch multi-query BM25 — the serving shape: N queries scored in
    ONE corpus pass. The union of all query terms forms a single tf
    matrix per batch (one tokenize, one equality scan per unique term);
    each query then sums ITS terms in query order (float parity with the
    per-query SQL chain). Per (batch, query) local top-k bounds the
    merge at k x n_queries x n_blocks rows; the driver finalizes
    per-query. Output: (query_id, doc_id, score), (query_id, score
    DESC, doc_id) ordered."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..functions.text import tokenize_array

    per_query = [[t for t in q.split() if t] for q in queries]
    uniq_terms = []
    for terms in per_query:
        for t in terms:
            if t not in uniq_terms:
                uniq_terms.append(t)
    tindex = {t: j for j, t in enumerate(uniq_terms)}
    m = len(uniq_terms)
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def _tf_matrix(toks: pa.ListArray):
        offsets = np.asarray(toks.offsets, np.int64)
        lengths = np.diff(offsets)
        dl = lengths.astype(np.float64)
        nrows = len(dl)
        tf = np.zeros((nrows, m), np.float64)
        if offsets[-1] > offsets[0]:
            vals = toks.values
            docidx = np.repeat(np.arange(nrows, dtype=np.int64), lengths)
            base = offsets[0]
            for j, term in enumerate(uniq_terms):
                eq = np.asarray(pc.equal(vals, term).fill_null(False))
                hit = eq[base:offsets[-1]]
                if hit.any():
                    tf[:, j] = np.bincount(docidx[hit], minlength=nrows)
        return tf, dl

    def _stats(t: pa.Table) -> pa.Table:
        tf, dl = _tf_matrix(tokenize_array(t["text"]))
        return pa.table({
            "n_docs": pa.array([len(dl)], pa.int64()),
            "dl_sum": pa.array([int(dl.sum())], pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).astype(np.int64).tolist()],
                           pa.list_(pa.int64())),
        })

    stats = ds.map_batches(_stats, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096).to_pandas()
    n_docs = float(stats["n_docs"].sum())
    dl_sum = float(stats["dl_sum"].sum())
    df = np.sum(np.stack(stats["df"].to_numpy()), axis=0).astype(np.float64)
    avgdl = dl_sum / n_docs if n_docs else 1.0
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    consts = ray.put((idf, avgdl))

    def _score(t: pa.Table) -> pa.Table:
        idf_, avgdl_ = ray.get(consts)
        tf, dl = _tf_matrix(tokenize_array(t["text"]))
        norm = K1 * (1.0 - B + B * dl / avgdl_)
        scale = 1e6
        outs = []
        ids = np.asarray(t["doc_id"])
        for qi, terms in enumerate(per_query):
            raw = np.zeros(len(dl), np.float64)
            for term in terms:  # the query's own left-to-right order
                j = tindex[term]
                raw += idf_[j] * (tf[:, j] * (K1 + 1.0)) / (tf[:, j] + norm)
            keep = raw > 0.0
            out = pa.table({
                "query_id": pa.array(
                    np.full(int(keep.sum()), qi, np.int64)),
                "doc_id": pa.array(ids[keep], pa.int64()),
                "score": pa.array(np.rint(raw[keep] * scale) / scale),
            })
            if out.num_rows > k:
                order = pc.sort_indices(out, sort_keys=[
                    ("score", "descending"), ("doc_id", "ascending")])
                out = out.take(order[:k])
            outs.append(out)
        return pa.concat_tables(outs)

    # per-query top-k through ONE query_id exchange (each bucket holds
    # every surviving candidate of its queries — <= k x n_blocks rows);
    # the driver sees only the k x n_queries final rows
    from ..util import bucketed_group_map

    def _bucket_topk(df):
        df = df.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("query_id", sort=True).head(k)

    cand = ds.map_batches(_score, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=4096)
    final = (bucketed_group_map(cand, "query_id", _bucket_topk,
                                num_buckets=None)
             .to_pandas()
             .sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
             .reset_index(drop=True))
    return pa.Table.from_pandas(final, preserve_index=False)
