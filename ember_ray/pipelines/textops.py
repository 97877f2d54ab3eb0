"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

These extend the reference's text surface (M3 tokenizer / M6 flatten / M7
concat) with the operations a 100 TB corpus pipeline needs. All are
stateless vectorized ``map_batches`` except language-ID, whose n-gram
profile table is per-actor state (reference T1 pattern).

Oracle notes: oracle-checked outputs stick to integer columns (token /
stopword counts) — float aggregates are rounded explicitly where used so
the DuckDB comparison is exact.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "and", "to")


def _rp(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def token_count(sf_dir: str):
    """Per-doc whitespace token count (SQL: len(string_split(text, ' ')))."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], pattern=" "))
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(sf_dir: str):
    """Per-doc quality counters: token count + stopword count (integer —
    exact vs the DuckDB list_filter oracle)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    stop = pa.array(list(STOPWORDS))

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], pattern=" ")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=stop)
        lst = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = np.asarray(lst.offsets)
        stop_np = np.asarray(
            is_stop.combine_chunks() if isinstance(is_stop, pa.ChunkedArray) else is_stop
        ).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(stop_np)])
        per_row = csum[offsets[1:]] - csum[offsets[:-1]]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n,
                "n_stopwords": pa.array(per_row, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_by_lang(sf_dir: str):
    """Corpus-level quality profile per language (integer sums — exact).
    Partial+final: each batch collapses to ≤n_langs rows before the
    (value-sorting) Aggregate — never the raw table through the shuffle."""
    from ray.data.aggregate import Max, Sum

    ds = _rp(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow partial (VERDICT r3 #7): no pandas round-trip
        g = t.group_by("lang").aggregate(
            [([], "count_all"), ("n_chars", "sum"), ("n_chars", "max")])
        return pa.table({
            "lang": g["lang"],
            "n_docs": g["count_all"],
            "sum_chars": g["n_chars_sum"],
            "max_chars": g["n_chars_max"],
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return parts.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
        Max("max_chars", alias_name="max_chars"),
    )


class LangId:
    """Heuristic n-gram language-ID (actor-pool stage, T1 pattern: profile
    table built once per actor in __init__). Deterministic; rows-only check
    (not SQL-expressible)."""

    PROFILES = {
        "en": ("the", "and", "ing", "ion", "of "),
        "de": ("der", "die", "und", "sch", "ein"),
        "fr": ("les", "des", "ent", "que", "ion"),
        "es": ("los", "las", "ión", "ent", "que"),
        "zh": (),  # CJK detected by codepoint range
    }

    def __init__(self):
        # fixed lang order: ties resolve to the earliest (argmax first-max),
        # matching the original dict-iteration semantics
        self.langs = [l for l in self.PROFILES if self.PROFILES[l]]
        self.grams = {l: self.PROFILES[l] for l in self.langs}

    def __call__(self, t: pa.Table) -> pa.Table:
        # fully vectorized: one utf8_lower, one CJK regex over the first 200
        # chars, and 5 grams × 4 langs count_substring kernel calls —
        # no per-row Python loop
        lower = pc.utf8_lower(pc.coalesce(t["text"], ""))
        head = pc.utf8_slice_codeunits(lower, 0, 200)
        is_zh = np.asarray(
            pc.match_substring_regex(head, "[一-鿿]").combine_chunks()
        )
        counts = np.stack(
            [
                sum(
                    np.asarray(pc.count_substring(lower, g).combine_chunks())
                    for g in self.grams[lang]
                )
                for lang in self.langs
            ]
        )  # (n_langs, n_rows)
        best = np.argmax(counts, axis=0)  # first max wins ties
        preds = np.asarray(self.langs, object)[best]
        preds[is_zh] = "zh"
        return pa.table(
            {"doc_id": t["doc_id"], "lang_pred": pa.array(preds.tolist(), pa.string())}
        )


def lang_id(sf_dir: str, concurrency: int = 2):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=2048,
    )


def detok_roundtrip(sf_dir: str):
    """Tokenize → detokenize per doc (reference F5 ``' '.join(tokens)``,
    dm.py:247-251): the joined token stream equals the normalized text —
    oracle-checked against the same normalization in SQL."""
    from ..functions.text import detokenize, tokenize_array

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        return pa.table({"doc_id": t["doc_id"], "detok": detokenize(toks)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def payload_paths(sf_dir: str, num_shards: int = 16):
    """Sharded output path per document (reference M8/F7 path format,
    alidatamodule.py:136-137); oracle-checked string construction."""
    from ..functions.text import format_paths

    ds = _rp(sf_dir, "documents", columns=["doc_id"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"],
             "path": format_paths(t["doc_id"], num_shards=num_shards)}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(sf_dir: str):
    """Content fingerprint per document: md5 of the NORMALIZED text.

    md5 (not xxhash) so the fingerprint is reproducible by any engine —
    and DuckDB's ``md5()`` recomputes it as the oracle. The digest loop is
    a C-speed hashlib call per row (~1 µs/row); the normalization feeding
    it is vectorized Arrow. A 64-bit xxhash variant remains the cheaper
    in-pipeline choice where cross-engine reproducibility isn't needed
    (see ``util.stable_hash64``)."""
    import hashlib

    from ..functions.text import normalize

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize(t["text"])
        fp = pa.array(
            [hashlib.md5((s or "").encode()).hexdigest()
             for s in norm.to_pylist()],
            pa.string(),
        )
        return pa.table({"doc_id": t["doc_id"], "fp": fp})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def ngram_counts(sf_dir: str, n: int = 3, k: int = 50, num_buckets: int = 32):
    """Global top-k token n-grams (the corpus-statistics pass an LLM-data
    pipeline runs for contamination/boilerplate screens).

    Per batch: tokenize (normalized, NON-distinct token sequence), form
    n-gram strings zero-copy from the flat token values (shifted
    ``Array.slice`` views joined element-wise — n-grams crossing a
    document boundary are masked out via the list offsets), pre-count
    with an Arrow group_by. One hash exchange on the n-gram co-locates
    each n-gram in exactly one bucket; per-bucket totals take a LOCAL
    top-k, so the driver-side final sort sees ≤ k·num_buckets rows.
    Deterministic tie-break: (count DESC, ngram ASC) on both sides.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.text import tokenize_array
    from ..util import hash_exchange

    ds = _rp(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        offsets = np.asarray(toks.offsets, np.int64)
        total = int(offsets[-1])
        L = total - (n - 1)
        if L <= 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vals = toks.values
        grams = pc.binary_join_element_wise(
            *[vals.slice(j, L) for j in range(n)], " ")
        # mask n-grams that straddle a document boundary
        valid = np.ones(L, bool)
        for j in range(1, n):
            b = offsets[1:-1] - j
            b = b[(b >= 0) & (b < L)]
            valid[b] = False
        g = pa.table({"ngram": grams.filter(pa.array(valid))}).group_by(
            "ngram").aggregate([([], "count_all")])
        return pa.table({"ngram": g["ngram"], "n": g["count_all"]})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096)

    def bucket_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by("ngram").aggregate([("n", "sum")])
        g = pa.table({"ngram": g["ngram"], "n": g["n_sum"]})
        order = pc.sort_indices(
            g, sort_keys=[("n", "descending"), ("ngram", "ascending")])
        return g.take(order[:k])

    out = hash_exchange(parts, key="ngram", num_buckets=num_buckets,
                        reduce_fn=bucket_topk, arrow=True)
    return out.sort(["n", "ngram"], descending=[True, False]).limit(k)


def repetition_scores(sf_dir: str, n: int = 3):
    """Per-doc repetition counters for the Gopher-style "fraction of
    duplicate n-grams" quality rule: ``(doc_id, n_grams, n_distinct)``
    over normalized token 3-grams. Integer columns — exact vs the DuckDB
    ``len`` / ``len(list_distinct(...))`` oracle; the caller derives the
    duplicate fraction ``1 - n_distinct/n_grams`` downstream so no float
    crosses the comparison.

    Kernel: one tokenize + the shared zero-copy gram build
    (``curation._doc_ngrams``), then ONE Arrow ``group_by(doc
    row).count_distinct`` per batch — no per-document Python. Stateless
    streaming map_batches; nothing shuffles."""
    from .curation import _doc_ngrams

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        out_total = np.zeros(t.num_rows, np.int64)
        out_dist = np.zeros(t.num_rows, np.int64)
        grams, di = _doc_ngrams(t["text"], n)
        if len(di):
            row, cnt = np.unique(di, return_counts=True)
            out_total[row] = cnt
            g = pa.table({"d": pa.array(di), "g": grams}).group_by(
                "d").aggregate([("g", "count_distinct")])
            out_dist[g["d"].to_numpy()] = g["g_count_distinct"].to_numpy()
        return pa.table({"doc_id": ids,
                         "n_grams": pa.array(out_total),
                         "n_distinct": pa.array(out_dist)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=4096)


def tfidf_keywords(sf_dir: str, k: int = 3, num_buckets: int = 32,
                   broadcast_threshold: int = 4_000_000):
    """Per-document top-k TF-IDF keywords: ``score = tf · ln(N/df)`` over
    normalized tokens, the classic corpus-keyword pass (salient-term
    indexing / boilerplate screens).

    Two passes, one shuffle: (1) per-batch per-doc DISTINCT tokens →
    Arrow pre-count → one hash exchange on the token summing document
    frequencies (the only all-to-all; 8-40 B/row, text never moves);
    (2) the df table broadcasts once as a zero-copy Arrow index (vocab
    grows sublinearly — Heaps' law) and a stateless map_batches computes
    per-doc tf (one Arrow group_by per batch), scores, and batch-local
    top-k — a doc's tokens never span batches, so the top-k never
    shuffles. Above ``broadcast_threshold`` the df table stays a
    DATASET and attaches via ``util.bucketed_join`` on the token (same
    hybrid rule as the ER IDF at ``er.py``), then one doc-keyed exchange
    takes the per-doc top-k — two extra bounded exchanges instead of an
    unbroadcastable vocab. Both paths share the identical float
    expression (tf · ln(N/df), round-at-1e6) and tie-break (score DESC,
    token ASC), pinned by a path-parity pytest with threshold=0."""
    from ..functions.text import tokenize_array
    from ..util import (broadcast_lookup, build_broadcast_index,
                        dataset_to_arrow, hash_exchange)

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata only

    def df_partial(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        offsets = np.asarray(toks.offsets, np.int64)
        if int(offsets[-1]) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        d = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                      np.diff(offsets))
        g = (pa.table({"d": pa.array(d), "token": toks.values})
             .group_by(["d", "token"]).aggregate([])  # distinct per doc
             .group_by("token").aggregate([([], "count_all")]))
        return pa.table({"token": g["token"], "df": g["count_all"]})

    parts = ds.map_batches(df_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096)

    def df_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        g = t.group_by("token").aggregate([("df", "sum")])
        return pa.table({"token": g["token"],
                         "df": pc.cast(g["df_sum"], pa.int64())})

    df_ds = hash_exchange(parts, key="token", num_buckets=num_buckets,
                          reduce_fn=df_sum, arrow=True).materialize()
    import ray

    if df_ds.count() > broadcast_threshold:
        return _tfidf_bucketed(ds, df_ds, n_docs, k, num_buckets)
    dref = ray.put(build_broadcast_index(
        dataset_to_arrow(df_ds), "token", ["df"]))

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "score": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        toks = tokenize_array(t["text"])
        offsets = np.asarray(toks.offsets, np.int64)
        if int(offsets[-1]) == 0:
            return empty
        d = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                      np.diff(offsets))
        tf = (pa.table({"d": pa.array(d), "token": toks.values})
              .group_by(["d", "token"]).aggregate([([], "count_all")]))
        dfv = broadcast_lookup(ray.get(dref), tf["token"], "df")
        s = (tf["count_all"].to_numpy().astype(np.float64)
             * np.log(n_docs / dfv.to_numpy().astype(np.float64)))
        s = np.rint(s * 1e6) / 1e6
        ids = pc.cast(t["doc_id"], pa.int64()).take(tf["d"])
        out = pa.table({"doc_id": ids, "token": tf["token"],
                        "score": pa.array(s, pa.float64())})
        order = pc.sort_indices(out, sort_keys=[
            ("doc_id", "ascending"), ("score", "descending"),
            ("token", "ascending")])
        out = out.take(order)
        # batch-local per-doc head(k): rank = position - first position
        did = out["doc_id"].to_numpy()
        firsts = np.r_[True, did[1:] != did[:-1]]
        starts = np.flatnonzero(firsts)
        rank = np.arange(len(did)) - np.repeat(starts, np.diff(
            np.r_[starts, len(did)]))
        return out.filter(pa.array(rank < k))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=4096)


def _tfidf_bucketed(ds, df_ds, n_docs: int, k: int, num_buckets: int):
    """Scale path for ``tfidf_keywords``: the df vocab stays DISTRIBUTED.

    (doc_id, token, tf) partials attach the document frequency through
    ONE bucketed token-hash join (``util.bucketed_join`` — the big-side
    route of the er.py IDF hybrid rule), scores compute per bucket with
    the IDENTICAL float expression as the broadcast path, and one
    doc-keyed exchange takes the exact per-doc top-k (the token join
    scatters a doc's scored tokens, so the top-k needs the
    co-partition). Two extra bounded exchanges; no driver-side vocab."""
    from ..functions.text import tokenize_array
    from ..util import bucketed_group_map, bucketed_join

    def tf_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        toks = tokenize_array(t["text"])
        offsets = np.asarray(toks.offsets, np.int64)
        if int(offsets[-1]) == 0:
            return empty
        d = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                      np.diff(offsets))
        g = (pa.table({"d": pa.array(d), "token": toks.values})
             .group_by(["d", "token"]).aggregate([([], "count_all")]))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()).take(g["d"]),
            "token": g["token"],
            "tf": pc.cast(g["count_all"], pa.int64())})

    tf_ds = ds.map_batches(tf_fn, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096)
    joined = bucketed_join(tf_ds, df_ds, on="token",
                           num_buckets=num_buckets)

    def topk_fn(df):
        # expression identity with the broadcast path: tf·ln(N/df), rint
        s = (df["tf"].to_numpy().astype(np.float64)
             * np.log(n_docs / df["df"].to_numpy().astype(np.float64)))
        df = df.assign(score=np.rint(s * 1e6) / 1e6)
        df = df.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True])
        rank = df.groupby("doc_id", sort=False).cumcount()
        return df.loc[rank.to_numpy() < k, ["doc_id", "token", "score"]]

    return bucketed_group_map(joined, "doc_id", topk_fn,
                              num_buckets=num_buckets)


def zscore_norm(sf_dir: str):
    """Per-language z-score normalization of document length — the
    feature-calibration pass mixture-balancing runs before thresholding
    heterogeneous subcorpora (a 'short' English doc and a 'short' code
    doc sit at the same z).

    Two passes, no shuffle: (1) per-batch integer moment partials
    (count, Σx, Σx²) per lang — exact int64 arithmetic, ≤ langs rows per
    batch — gathered once (langs × blocks tiny rows); (2) a stateless
    map_batches applies z = (x − μ)/σ. Float parity is by EXPRESSION
    IDENTITY, not rounding alone: both engines compute μ = s/c and
    σ² = (ss − s·s/c)/c from the SAME exact integer aggregates, so every
    IEEE operation sequence matches bitwise; the final round-at-1e6 is
    belt-and-braces. Degenerate groups (σ = 0) map to z = 0 on both
    sides."""
    import ray

    from ..util import dataset_to_arrow

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "ss": pa.array([], pa.int64())})
        x = np.asarray(t["n_chars"], np.int64)
        g = pa.table({"lang": t["lang"],
                      "x": pa.array(x, pa.int64()),
                      "xx": pa.array(x * x, pa.int64())}).group_by(
            "lang").aggregate([([], "count_all"), ("x", "sum"),
                               ("xx", "sum")])
        return pa.table({"lang": g["lang"],
                         "c": pc.cast(g["count_all"], pa.int64()),
                         "s": pc.cast(g["x_sum"], pa.int64()),
                         "ss": pc.cast(g["xx_sum"], pa.int64())})

    parts = dataset_to_arrow(ds.map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True))
    fin = parts.group_by("lang").aggregate(
        [("c", "sum"), ("s", "sum"), ("ss", "sum")])
    stats = {}
    for lang, c, s, ss in zip(fin["lang"].to_pylist(),
                              fin["c_sum"].to_pylist(),
                              fin["s_sum"].to_pylist(),
                              fin["ss_sum"].to_pylist()):
        mu = s / c                      # exact-int doubles: identical in SQL
        var = (ss - float(s) * s / c) / c
        stats[lang] = (mu, np.sqrt(var) if var > 0 else 0.0)
    sref = ray.put(stats)  # ≤ langs entries — trivially broadcastable

    def z(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "z": pa.array([], pa.float64())})
        st = ray.get(sref)
        d = t["lang"].combine_chunks().dictionary_encode()
        codes = np.asarray(d.indices, np.int64)
        mus = np.asarray([st[v][0] for v in d.dictionary.to_pylist()])[codes]
        sds = np.asarray([st[v][1] for v in d.dictionary.to_pylist()])[codes]
        x = np.asarray(t["n_chars"], np.int64).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            zz = np.where(sds > 0, (x - mus) / sds, 0.0)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "lang": t["lang"],
                         "z": pa.array(np.rint(zz * 1e6) / 1e6,
                                       pa.float64())})

    return ds.map_batches(z, batch_format="pyarrow", zero_copy_batch=True)


def pmi_collocations(sf_dir: str, min_count: int = 5, k: int = 50,
                     num_buckets: int = 32,
                     broadcast_threshold: int = 4_000_000):
    """Top-k PMI collocations (phrase mining): adjacent normalized token
    pairs ranked by pointwise mutual information
    ``ln((c_xy/N) / ((c_x/T)·(c_y/T)))`` with a ``min_count`` support
    floor — the corpus pass that surfaces multiword expressions to
    protect during tokenization/dedup.

    Scale shape: per-batch bigram AND unigram pre-counts (one Arrow
    group_by each; grams built zero-copy from the flat token buffer);
    ONE hash exchange on the bigram sums supports; the unigram table
    (vocab — sublinear, Heaps' law; guarded by ``broadcast_threshold``)
    broadcasts once; each bigram bucket filters support, looks both
    sides up map-side, computes PMI and a LOCAL top-k, so the driver
    merge sees ≤ k·buckets rows. Float parity by expression identity:
    both engines evaluate ``ln((c_xy·T·T)/(N·c_x·c_y))`` left-to-right
    from exact integer counts, then round-at-1e6; ties break
    (pmi DESC, w1, w2)."""
    import ray

    from ..functions.text import tokenize_array
    from ..util import (broadcast_lookup, build_broadcast_index,
                        dataset_to_arrow, hash_exchange)

    ds = _rp(sf_dir, "documents", columns=["text"])

    def partials(t: pa.Table):
        toks = tokenize_array(t["text"])
        offsets = np.asarray(toks.offsets, np.int64)
        total = int(offsets[-1])
        out_u = pa.table({"w": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        out_b = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if total:
            g = pa.table({"w": toks.values}).group_by("w").aggregate(
                [([], "count_all")])
            out_u = pa.table({"w": g["w"],
                              "c": pc.cast(g["count_all"], pa.int64())})
        L = total - 1
        if L > 0:
            valid = np.ones(L, bool)
            b = offsets[1:-1] - 1
            valid[b[(b >= 0) & (b < L)]] = False  # cross-doc pairs
            keep = pa.array(valid)
            g = pa.table({
                "w1": toks.values.slice(0, L).filter(keep),
                "w2": toks.values.slice(1, L).filter(keep),
            }).group_by(["w1", "w2"]).aggregate([([], "count_all")])
            out_b = pa.table({"w1": g["w1"], "w2": g["w2"],
                              "c": pc.cast(g["count_all"], pa.int64())})
        return out_u, out_b

    def uni_partial(t: pa.Table) -> pa.Table:
        return partials(t)[0]

    def bi_partial(t: pa.Table) -> pa.Table:
        return partials(t)[1]

    uni_parts = ds.map_batches(uni_partial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=4096)

    def uni_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"w": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        g = t.group_by("w").aggregate([("c", "sum")])
        return pa.table({"w": g["w"], "c": pc.cast(g["c_sum"], pa.int64())})

    uni_ds = hash_exchange(
        uni_parts, key="w", num_buckets=num_buckets, reduce_fn=uni_sum,
        arrow=True).materialize()
    T = int(uni_ds.sum("c") or 0) if uni_ds.count() else 0

    bi_parts = ds.map_batches(bi_partial, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=4096).materialize()
    # N = total bigram occurrences (sum of partials — exact)
    N = int(bi_parts.sum("c") or 0) if bi_parts.count() else 0
    if uni_ds.count() > broadcast_threshold:
        return _pmi_bucketed(bi_parts, uni_ds, T, N, min_count, k,
                             num_buckets)
    uni = dataset_to_arrow(uni_ds)
    uref = ray.put(build_broadcast_index(uni, "w", ["c"]))

    def bucket_pmi(t: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "pmi": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by(["w1", "w2"]).aggregate([("c", "sum")])
        n = g["c_sum"].to_numpy().astype(np.int64)
        keep = n >= min_count
        if not keep.any():
            return empty
        g = g.filter(pa.array(keep))
        n = n[keep]
        idx = ray.get(uref)
        c1 = broadcast_lookup(idx, g["w1"], "c").to_numpy().astype(np.int64)
        c2 = broadcast_lookup(idx, g["w2"], "c").to_numpy().astype(np.int64)
        # expression identity with the SQL: (c·T·T)/(N·c1·c2), then ln
        val = np.log((n.astype(np.float64) * T * T)
                     / (float(N) * c1 * c2))
        out = pa.table({"w1": g["w1"], "w2": g["w2"],
                        "n": pa.array(n, pa.int64()),
                        "pmi": pa.array(np.rint(val * 1e6) / 1e6,
                                        pa.float64())})
        order = pc.sort_indices(out, sort_keys=[
            ("pmi", "descending"), ("w1", "ascending"),
            ("w2", "ascending")])
        return out.take(order[:k])

    out = hash_exchange(bi_parts, key="w1", num_buckets=num_buckets,
                        reduce_fn=bucket_pmi, arrow=True)
    return out.sort(["pmi", "w1", "w2"],
                    descending=[True, False, False]).limit(k)


def _pmi_bucketed(bi_parts, uni_ds, T: int, N: int, min_count: int,
                  k: int, num_buckets: int):
    """Scale path for ``pmi_collocations``: the unigram vocab stays
    DISTRIBUTED. Bigram supports sum through one w1-keyed exchange
    (support floor applied there — the big cut), then c_x and c_y attach
    via TWO bucketed unigram joins (``util.bucketed_join``, the er.py
    IDF big-side route); PMI computes per batch with the IDENTICAL float
    expression as the broadcast path, batch-local top-k bounds the final
    sort. Exchanges carry only (w1, w2, counts) — never token streams."""
    from ..util import bucketed_join, hash_exchange

    def bi_sum(t: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by(["w1", "w2"]).aggregate([("c", "sum")])
        n = pc.cast(g["c_sum"], pa.int64())
        keep = pc.greater_equal(n, min_count)
        return pa.table({"w1": g["w1"], "w2": g["w2"],
                         "n": n}).filter(keep)

    bi = hash_exchange(bi_parts, key="w1", num_buckets=num_buckets,
                       reduce_fn=bi_sum, arrow=True)

    def _ren(new):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(["w", new])
        return fn

    uni1 = uni_ds.map_batches(_ren("c1"), batch_format="pyarrow",
                              zero_copy_batch=True)
    uni2 = uni_ds.map_batches(_ren("c2"), batch_format="pyarrow",
                              zero_copy_batch=True)
    j1 = bucketed_join(bi, uni1, on="w1", right_on="w",
                       num_buckets=num_buckets)
    j2 = bucketed_join(j1, uni2, on="w2", right_on="w",
                       num_buckets=num_buckets)

    def pmi_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "pmi": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        n = t["n"].to_numpy().astype(np.int64)
        c1 = t["c1"].to_numpy().astype(np.int64)
        c2 = t["c2"].to_numpy().astype(np.int64)
        # expression identity with the broadcast path / SQL
        val = np.log((n.astype(np.float64) * T * T)
                     / (float(N) * c1 * c2))
        out = pa.table({"w1": t["w1"], "w2": t["w2"],
                        "n": pa.array(n, pa.int64()),
                        "pmi": pa.array(np.rint(val * 1e6) / 1e6,
                                        pa.float64())})
        order = pc.sort_indices(out, sort_keys=[
            ("pmi", "descending"), ("w1", "ascending"),
            ("w2", "ascending")])
        return out.take(order[:k])

    out = j2.map_batches(pmi_fn, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=8192)
    return out.sort(["pmi", "w1", "w2"],
                    descending=[True, False, False]).limit(k)


def vocab_topk(sf_dir: str, k: int = 1000, num_buckets: int = 32):
    """Corpus vocabulary build: top-k tokens by frequency with dense
    integer ids — the pass that seeds a tokenizer / frequency-cutoff
    vocabulary over a training corpus.

    Same scale shape as ``ngram_counts``: per-batch Arrow group_by
    pre-counts (the flat token values of ``tokenize_array``, no per-doc
    Python), ONE hash exchange co-locates each token, per-bucket totals
    take a LOCAL top-k, and the driver's final sort sees ≤ k·num_buckets
    rows before assigning ids. Deterministic: (count DESC, token ASC)
    tie-break both sides; token_id is the 1-based rank."""
    from ..functions.text import tokenize_array
    from ..util import hash_exchange

    ds = _rp(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        g = pa.table({"token": toks.values}).group_by("token").aggregate(
            [([], "count_all")])
        return pa.table({"token": g["token"], "n": g["count_all"]})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096)

    def bucket_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by("token").aggregate([("n", "sum")])
        g = pa.table({"token": g["token"], "n": g["n_sum"]})
        order = pc.sort_indices(
            g, sort_keys=[("n", "descending"), ("token", "ascending")])
        return g.take(order[:k])

    out = hash_exchange(parts, key="token", num_buckets=num_buckets,
                        reduce_fn=bucket_topk, arrow=True)
    pdf = (out.sort(["n", "token"], descending=[True, False]).limit(k)
           .to_pandas()
           .sort_values(["n", "token"], ascending=[False, True],
                        kind="mergesort")
           .reset_index(drop=True))
    pdf["token_id"] = np.arange(1, len(pdf) + 1, dtype=np.int64)
    return pa.Table.from_pandas(pdf[["token", "n", "token_id"]],
                                preserve_index=False)
