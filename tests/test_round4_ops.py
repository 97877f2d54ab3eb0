"""Round-4 operators: per-group exact distinct counts, near-dup cluster
canonicalization (minhash pairs → transitive closure), and global top-k
token n-grams — each compared against a direct driver-side recomputation
on the sf0.001 corpus (independent of the DuckDB oracle path)."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_group_distinct_count_matches_pandas(ray_session):
    from ember_ray.pipelines.sketches import group_distinct_count

    got = (group_distinct_count(SF_DIR).to_pandas()
           .set_index("event_type")["n_distinct"].sort_index())
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    want = ev.groupby("event_type")["user_id"].nunique().sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert (got.values == want.values).all()


def test_dedup_minhash_clusters_is_min_label_closure(ray_session):
    """canonical_id must equal the min doc_id of the connected component
    induced by the VERIFIED pair set — checked against a driver-side
    union-find; singletons must canonicalize to themselves."""
    from ember_ray.pipelines.dedup import dedup_minhash, dedup_minhash_clusters

    pairs = dedup_minhash(SF_DIR).to_pandas()
    got = dedup_minhash_clusters(SF_DIR).to_pandas()

    all_ids = pq.read_table(f"{SF_DIR}/documents.parquet",
                            columns=["doc_id"])["doc_id"].to_numpy()
    # every document exactly once
    assert sorted(got["doc_id"]) == sorted(all_ids.tolist())

    parent = {int(i): int(i) for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_id_left"], pairs["doc_id_right"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    roots = collections.defaultdict(list)
    for i in all_ids:
        roots[find(int(i))].append(int(i))
    for members in roots.values():
        m = min(members)
        for i in members:
            want[i] = m

    got_map = dict(zip(got["doc_id"].astype(int), got["canonical_id"].astype(int)))
    assert got_map == want
    # non-degenerate: the corpus has planted near-dups → some real merges
    assert any(v != k for k, v in got_map.items())


def test_ngram_counts_matches_python_recompute(ray_session):
    """Top-50 trigrams vs a per-document Python recompute over the SAME
    tokenizer output — catches both count errors and document-boundary
    leakage (a cross-doc gram would inflate some count)."""
    from ember_ray.functions.text import tokenize_array
    from ember_ray.pipelines.textops import ngram_counts

    got = ngram_counts(SF_DIR).to_pandas()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    toks = tokenize_array(docs["text"].combine_chunks())
    counts = collections.Counter()
    for row in toks.to_pylist():
        for j in range(len(row) - 2):
            counts[" ".join(row[j:j + 3])] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert list(zip(got["ngram"], got["n"])) == [(g, np.int64(n))
                                                 for g, n in want]


def test_repetition_scores_planted_repeat(ray_session):
    """A doc made of one repeated phrase must show n_distinct << n_grams;
    a no-repeat doc shows n_distinct == n_grams; < 3 tokens -> zeros."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.pipelines.textops import repetition_scores

    with tempfile.TemporaryDirectory() as d:
        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([
                "spam ham spam ham spam ham spam ham",  # 6 grams, 2 kinds
                "all tokens here are unique words",     # 4 grams, 4 kinds
                "too short",                            # no grams
            ]),
        })
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = (repetition_scores(d).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got.loc[0, "n_grams"] == 6 and got.loc[0, "n_distinct"] == 2
        assert got.loc[1, "n_grams"] == 4 and got.loc[1, "n_distinct"] == 4
        assert got.loc[2, "n_grams"] == 0 and got.loc[2, "n_distinct"] == 0


def test_semdedup_planted_duplicate(ray_session, tmp_path):
    """A planted exact-duplicate vector pair must land in the same k-means
    cell (cosine 1.0 to each other) and the HIGHER vec_id must be pruned,
    keeping the lower — the deterministic keep-first rule."""
    import ember_ray.pipelines.ann as annmod
    from ember_ray.pipelines.dedup import semdedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 8)).astype(np.float32)
    base[37] = base[11]  # exact duplicate of an earlier vector
    d = tmp_path / "embeddings.parquet"
    d.mkdir()
    pq.write_table(
        pa.table({"vec_id": pa.array(range(60), pa.int64()),
                  "embedding": pa.array(list(base),
                                        pa.list_(pa.float32()))}),
        str(d / "part-0.parquet"))
    out = (semdedup(str(tmp_path), n_clusters=4, tau=0.99)
           .to_pandas().set_index("vec_id"))
    assert out.loc[11, "keep"] == 1
    assert out.loc[37, "keep"] == 0
    assert out.loc[37, "max_prior_sim"] == 1.0
    assert out.loc[37, "cluster_id"] == out.loc[11, "cluster_id"]
    # nothing else reaches tau=0.99 on random gaussians
    assert int((out["keep"] == 0).sum()) == 1


def test_semdedup_partition_invariance(ray_session):
    """Cell assignment, prune flags and similarities must not depend on
    the input block layout (the k-means sample is vec_id-sorted) nor on
    the exchange bucket count."""
    import ember_ray.pipelines.ann as annmod
    from ember_ray.pipelines.dedup import semdedup

    a = (semdedup(SF_DIR).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    orig = annmod._emb

    def shredded(sf_dir):
        return orig(sf_dir).repartition(13)

    annmod._emb = shredded
    try:
        b = (semdedup(SF_DIR, num_buckets=3).to_pandas()
             .sort_values("vec_id").reset_index(drop=True))
    finally:
        annmod._emb = orig
    assert a.equals(b)


def test_tfidf_keywords_planted_frequencies(ray_session, tmp_path):
    """A token present in EVERY doc scores ln(1)=0 and can never be a
    keyword ahead of rarer terms; a doc-unique token scores tf·ln(N)."""
    from ember_ray.pipelines.textops import tfidf_keywords

    d = tmp_path / "documents.parquet"
    d.mkdir()
    texts = [  # every doc carries >= 2 distinct non-ubiquitous tokens
        "common rare rare unique0",
        "common rare filler1 filler1",
        "common filler2 filler2 extra2",
        "common filler3 other3 other3",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(d / "part-0.parquet"))
    out = (tfidf_keywords(str(tmp_path), k=2).to_pandas()
           .sort_values(["doc_id", "score"], ascending=[True, False])
           .reset_index(drop=True))
    d0 = out[out["doc_id"] == 0]
    # doc 0: rare (tf=2, df=2 -> 2*ln(2)) beats unique0 (1*ln(4)=2ln2... tie!)
    # 2*ln(4/2) == 1*ln(4/1) exactly -> tie broken by token ASC: 'rare' < 'unique0'
    assert d0["token"].tolist() == ["rare", "unique0"]
    assert abs(d0["score"].iloc[0] - d0["score"].iloc[1]) < 1e-9
    # 'common' (df=4 -> score 0) is never selected anywhere
    assert "common" not in set(out["token"])


def test_zscore_norm_moments(ray_session):
    """Per-lang z-scores must have (weighted) mean ~0 and variance ~1,
    and be invariant to input block layout."""
    import ember_ray.pipelines.textops as tx
    from ember_ray.pipelines.textops import zscore_norm

    a = (zscore_norm(SF_DIR).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    for lang, grp in a.groupby("lang"):
        assert abs(grp["z"].mean()) < 1e-4
        assert abs(grp["z"].pow(2).mean() - 1.0) < 1e-3

    orig = tx._rp

    def shredded(sf_dir, table, columns=None):
        return orig(sf_dir, table, columns=columns).repartition(13)

    tx._rp = shredded
    try:
        b = (zscore_norm(SF_DIR).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    finally:
        tx._rp = orig
    assert a.equals(b)


def test_pmi_collocations_planted_pair(ray_session, tmp_path):
    """A bigram that ALWAYS co-occurs (every 'hong' is followed by 'kong')
    must out-rank a frequent-but-independent pair; support below
    min_count never appears."""
    from ember_ray.pipelines.textops import pmi_collocations

    d = tmp_path / "documents.parquet"
    d.mkdir()
    docs = (["hong kong visit report summary"] * 6
            + ["the data the report the data the summary"] * 6
            + ["rare pair"] * 2)  # support 2 < min_count
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        str(d / "part-0.parquet"))
    out = pmi_collocations(str(tmp_path), min_count=5, k=10).to_pandas()
    pairs = list(zip(out["w1"], out["w2"]))
    assert ("hong", "kong") == pairs[0]
    assert ("rare", "pair") not in pairs
    assert (out["n"] >= 5).all()
    # perfect collocation: c_xy == c_x == c_y == 6 -> pmi = ln(T*T/(N*6))
    import numpy as np
    got = out.iloc[0]["pmi"]
    T = sum(len(t.split()) for t in docs)
    N = sum(len(t.split()) - 1 for t in docs)
    want = np.rint(np.log((6.0 * T * T) / (float(N) * 6 * 6)) * 1e6) / 1e6
    assert got == want


def test_vocab_topk_ranks_match_recount(ray_session):
    """token_id must be the exact 1-based (count DESC, token ASC) rank of
    a full driver-side recount over the normalized token stream."""
    from ember_ray.functions.text import tokenize_array
    from ember_ray.pipelines.textops import vocab_topk

    got = vocab_topk(SF_DIR, k=200).to_pandas()
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    toks = tokenize_array(texts["text"].combine_chunks())
    cnt = collections.Counter(toks.values.to_pylist())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    assert list(got["token"]) == [w for w, _ in want]
    assert list(got["n"]) == [c for _, c in want]
    assert list(got["token_id"]) == list(range(1, len(want) + 1))


def test_tfidf_bucketed_path_parity(ray_session):
    """VERDICT r4 #2: forcing broadcast_threshold=0 routes the df table
    through the bucketed token join; output must match the broadcast
    path EXACTLY (same expression, same tie-break, same rounding)."""
    from ember_ray.pipelines.textops import tfidf_keywords

    key = ["doc_id", "token"]
    a = (tfidf_keywords(SF_DIR, k=3).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (tfidf_keywords(SF_DIR, k=3, broadcast_threshold=0).to_pandas()
         .sort_values(key).reset_index(drop=True))
    assert len(a) > 0
    assert a[key + ["score"]].equals(b[key + ["score"]])


def test_pmi_bucketed_path_parity(ray_session):
    """Same path-parity gate for pmi_collocations: distributed unigram
    joins must reproduce the broadcast-index result bitwise."""
    from ember_ray.pipelines.textops import pmi_collocations

    a = (pmi_collocations(SF_DIR, min_count=5, k=50).to_pandas()
         .reset_index(drop=True))
    b = (pmi_collocations(SF_DIR, min_count=5, k=50,
                          broadcast_threshold=0).to_pandas()
         .reset_index(drop=True))
    assert len(a) > 0
    assert a.equals(b)
