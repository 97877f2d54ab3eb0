"""Curation operators (quality_filter / shard_pack) vs direct DuckDB."""

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')")
    out = con.execute(sql).df()
    con.close()
    return out


def test_quality_filter_matches_sql(ray_session):
    from ember_ray.pipelines.curation import quality_filter

    got = (quality_filter(SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _duck(
        "WITH b AS (SELECT lang,"
        " round(quantile_cont(n_chars, 0.05)*1000000)/1000000 AS lo,"
        " round(quantile_cont(n_chars, 0.95)*1000000)/1000000 AS hi"
        " FROM documents GROUP BY lang)"
        " SELECT d.doc_id, d.lang, d.n_chars FROM documents d"
        " JOIN b USING (lang) WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi"
        " ORDER BY d.doc_id")
    assert len(got) > 0 and len(got) < len(
        _duck("SELECT doc_id FROM documents"))
    assert got[["doc_id", "lang", "n_chars"]].equals(
        want[["doc_id", "lang", "n_chars"]])


def test_shard_pack_matches_window_cumsum(ray_session):
    from ember_ray.pipelines.curation import shard_pack

    got = (shard_pack(SF_DIR, budget=5000).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _duck(
        "SELECT doc_id, n_chars, CAST(floor(coalesce(sum(n_chars) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        "), 0) / 5000) AS BIGINT) AS shard_id FROM documents "
        "ORDER BY doc_id")
    assert got["shard_id"].max() > 0, "budget must split multiple shards"
    assert got.astype("int64").equals(want.astype("int64"))


def test_shard_pack_parallelism_invariant(ray_session):
    """Shard ids must not depend on block layout: re-split the input into
    many small blocks and expect identical assignment."""
    from ember_ray.pipelines.curation import shard_pack

    a = (shard_pack(SF_DIR, budget=3000).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))

    import ray.data as rd

    import ember_ray.pipelines.curation as cur

    orig = cur._rp

    def shredded(sf_dir, table, columns=None):
        return orig(sf_dir, table, columns=columns).repartition(17)

    cur._rp = shredded
    try:
        b = (shard_pack(SF_DIR, budget=3000).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    finally:
        cur._rp = orig
    assert a.equals(b)


def test_decontaminate_removes_planted_duplicate(ray_session):
    """A corpus doc that exactly duplicates an eval doc's NORMALIZED
    content must be dropped even though its own doc_id is not in the
    eval subset; non-duplicates survive."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.pipelines.curation import decontaminate

    with tempfile.TemporaryDirectory() as d:
        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 97], pa.int64()),
            "lang": pa.array(["en"] * 4),
            # doc 1 duplicates eval doc 0 up to normalization (case +
            # punctuation); doc 2 is clean; doc 97 is eval itself
            "text": pa.array(["Hello eval world.", "hello EVAL world",
                              "a clean document", "another eval doc"]),
        })
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = decontaminate(d).to_pandas()
        assert sorted(got["doc_id"].tolist()) == [2]


def test_decontaminate_ngram_planted_overlap(ray_session):
    """A corpus doc sharing one 5-gram with an eval doc is dropped even
    when the rest of its text differs entirely; docs with no shared gram
    survive, and docs shorter than 5 tokens are always kept."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.pipelines.curation import decontaminate_ngram

    with tempfile.TemporaryDirectory() as d:
        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "lang": pa.array(["en"] * 4),
            # doc 0 is eval (0 % 97 == 0); doc 1 embeds one of its
            # 5-grams mid-sentence; doc 2 shares words but never 5 in a
            # row; doc 3 has only 4 tokens (no grams -> kept)
            "text": pa.array([
                "alpha beta gamma delta epsilon zeta",
                "totally different start alpha beta gamma delta epsilon"
                " and more",
                "alpha beta gamma window never delta epsilon zeta runs",
                "alpha beta gamma delta",
            ]),
        })
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = decontaminate_ngram(d).to_pandas()
        assert sorted(got["doc_id"].tolist()) == [2, 3]


def test_doc_ngrams_boundary_and_rowindex():
    """_doc_ngrams: no gram straddles a document boundary; the row index
    maps each gram to its source document; short/empty docs yield none."""
    import pyarrow as pa

    from ember_ray.pipelines.curation import _doc_ngrams

    texts = pa.chunked_array([pa.array([
        "a b c d",      # 2 trigrams
        "",             # none
        "e f",          # none (< 3 tokens)
        "g h i j k",    # 3 trigrams
    ])])
    grams, di = _doc_ngrams(texts, 3)
    assert grams.to_pylist() == ["a b c", "b c d",
                                 "g h i", "h i j", "i j k"]
    assert di.tolist() == [0, 0, 3, 3, 3]


def test_curation_pipeline_bucket_invariance(ray_session):
    """The composed pipeline's output must not depend on the dedup
    exchange fan-out; shard ids must be nondecreasing in doc_id order
    and every output doc unique."""
    import pandas as pd

    from ember_ray.pipelines.curation import curation_pipeline

    a = (curation_pipeline(SF_DIR).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (curation_pipeline(SF_DIR, num_buckets=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["doc_id"].is_unique and len(a) > 0
    assert (a["shard_id"].diff().dropna() >= 0).all()


def test_stratified_sample_subset_and_rates(ray_session):
    """Content-hash sampling: smaller fractions select SUBSETS of larger
    ones (the ablation property), per-lang rates track the requested
    fractions, and resampling is byte-identical (no RNG state)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ember_ray.pipelines.curation import stratified_sample

    half = stratified_sample(
        SF_DIR, fracs={"en": 0.5, "de": 0.5, "fr": 0.5, "es": 0.5,
                       "zh": 0.5}).to_pandas()
    fifth = stratified_sample(
        SF_DIR, fracs={"en": 0.2, "de": 0.2, "fr": 0.2, "es": 0.2,
                       "zh": 0.2}).to_pandas()
    again = stratified_sample(
        SF_DIR, fracs={"en": 0.5, "de": 0.5, "fr": 0.5, "es": 0.5,
                       "zh": 0.5}).to_pandas()
    assert set(fifth["doc_id"]) <= set(half["doc_id"])
    assert sorted(again["doc_id"]) == sorted(half["doc_id"])
    n_docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id"]).num_rows
    rate = len(half) / n_docs
    assert 0.35 < rate < 0.65  # md5 uniformity at corpus size


def test_weighted_sample_subset_and_bias(ray_session):
    """Length-weighted Bernoulli draw: a larger scale (lower inclusion
    prob) selects a SUBSET of a smaller one, resampling is
    byte-identical, and the sample is length-biased (mean n_chars above
    the corpus mean)."""
    import pyarrow.parquet as pq

    from ember_ray.pipelines.curation import weighted_sample

    lo = weighted_sample(SF_DIR, scale=10_000.0).to_pandas()
    hi = weighted_sample(SF_DIR, scale=40_000.0).to_pandas()
    again = weighted_sample(SF_DIR, scale=10_000.0).to_pandas()
    assert len(hi) and set(hi["doc_id"]) <= set(lo["doc_id"])
    assert sorted(again["doc_id"]) == sorted(lo["doc_id"])
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["n_chars"]).to_pandas()
    assert lo["n_chars"].mean() > docs["n_chars"].mean()


def test_shuffle_order_partition_invariance(ray_session):
    """The content-hash training order is a permutation (every pos
    exactly once) and must not depend on the input block layout."""
    import ember_ray.pipelines.curation as cur
    from ember_ray.pipelines.curation import shuffle_order

    a = (shuffle_order(SF_DIR).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert sorted(a["pos"].tolist()) == list(range(len(a)))

    orig = cur._rp

    def shredded(sf_dir, table, columns=None):
        return orig(sf_dir, table, columns=columns).repartition(17)

    cur._rp = shredded
    try:
        b = (shuffle_order(SF_DIR).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    finally:
        cur._rp = orig
    assert a.equals(b)


def test_scrub_pii_planted_free_text():
    """The kernel on adversarial free text: staged redaction (a digit run
    inside an already-redacted email must not double-count), nulls, and
    empty strings."""
    import pyarrow as pa

    from ember_ray.functions.text import scrub_pii

    arr = pa.chunked_array([pa.array([
        "mail a.b+c@ex-1.example.co.uk now",     # email w/ digits inside
        "call 555-1234 then 555-12345",          # ext, then too-long ext
        "ids 7, 42 and 1999",                    # bare digit runs
        None,
        "",
        "no pii at all",
    ], pa.string())])
    scrubbed, n = scrub_pii(arr)
    assert scrubbed.to_pylist() == [
        "mail [EMAIL] now",
        "call [PHONE] then [NUM]-[NUM]",
        "ids [NUM], [NUM] and [NUM]",
        None,
        "",
        "no pii at all",
    ]
    assert n.tolist() == [1, 3, 3, 0, 0, 0]


def test_pii_scrub_matches_oracle(ray_session):
    """Pipeline vs the DuckDB staged-regexp oracle on the real customer
    table (both engines are RE2 — exact string parity expected)."""
    import __ray_entry__ as entry
    from ember_ray.pipelines.curation import pii_scrub

    got = (pii_scrub(SF_DIR).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')")
    want = (con.execute(entry._pii_scrub_sql()).df()
            .sort_values("c_custkey").reset_index(drop=True))
    con.close()
    assert got["contact"].tolist() == want["contact"].tolist()
    assert got["n_pii"].tolist() == want["n_pii"].tolist()
    assert (got["n_pii"] > 0).all()


def test_group_sample_quota_and_invariance(ray_session):
    """Exactly min(n, group size) docs per lang, deterministic under
    reshuffled input blocks and a different bucket count."""
    import ember_ray.pipelines.curation as cur
    from ember_ray.pipelines.curation import group_sample

    a = (group_sample(SF_DIR, n_per_group=20).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    sizes = a.groupby("lang").size()
    assert (sizes <= 20).all() and sizes.max() == 20

    orig = cur._rp

    def shredded(sf_dir, table, columns=None):
        return orig(sf_dir, table, columns=columns).repartition(17)

    cur._rp = shredded
    try:
        b = (group_sample(SF_DIR, n_per_group=20, num_buckets=3)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    finally:
        cur._rp = orig
    assert a.equals(b)


def test_contamination_report_planted(ray_session, tmp_path):
    """An eval doc sharing a 5-gram run with a corpus doc reports a
    positive fraction; an eval doc with unique text reports 0; docs with
    < 5 tokens emit no row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.pipelines.curation import contamination_report

    d = tmp_path / "documents.parquet"
    d.mkdir()
    leak = "alpha beta gamma delta epsilon zeta"
    texts = {
        0: leak + " plus some extra eval tail words here",   # eval (0%97)
        97: "completely different unique eval words one two three four five",
        194: "tiny doc",                                     # < 5 tokens
        1: "corpus prefix " + leak + " corpus suffix words",  # leaks into 0
        2: "unrelated corpus content with plenty of words in it",
    }
    pq.write_table(
        pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()), pa.string())}),
        str(d / "part-0.parquet"))
    out = (contamination_report(str(tmp_path)).to_pandas()
           .set_index("doc_id"))
    assert set(out.index) == {0, 97}          # 194 has no grams
    assert out.loc[0, "n_hit"] == 2           # the two full leak 5-grams
    assert out.loc[0, "frac"] > 0
    assert out.loc[97, "n_hit"] == 0 and out.loc[97, "frac"] == 0.0
