"""Sketch / summary operators (pipelines/sketches.py): HLL accuracy &
mergeability, quantile interpolation parity with DuckDB, and the exact
distinct-count pipeline against a direct computation."""

import numpy as np
import pyarrow as pa
import pytest

from ember_ray.pipelines.sketches import (_hll_partial, _quantile_cont,
                                          distinct_count, distinct_count_hll,
                                          group_quantiles, hll_estimate)

SF_DIR = "/root/testdata/sf0.001"


def test_hll_estimate_within_expected_error():
    rng = np.random.default_rng(142)
    for n_true in (1_000, 50_000):
        vals = rng.integers(0, 1 << 62, size=n_true * 2)
        vals = np.unique(vals)[:n_true]
        reg = _hll_partial(pa.array(vals, pa.int64()), p=14)
        est = hll_estimate(reg)
        # rel. std. err. at p=14 is ~0.8%; 4 sigma ≈ 3.3%
        assert abs(est - n_true) / n_true < 0.033


def test_hll_partials_merge_by_max():
    rng = np.random.default_rng(7)
    a = pa.array(rng.integers(0, 1 << 40, size=5000), pa.int64())
    b = pa.array(rng.integers(0, 1 << 40, size=5000), pa.int64())
    both = pa.concat_arrays([a, b])
    merged = np.maximum(_hll_partial(a, 14), _hll_partial(b, 14))
    assert np.array_equal(merged, _hll_partial(both, 14))


def test_quantile_cont_matches_duckdb():
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(3)
    v = np.sort(rng.normal(size=1001))
    con = duckdb.connect()
    for q in (0.0, 0.25, 0.5, 0.95, 1.0):
        want = con.execute(
            "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?) AS x)",
            [q, v.tolist()],
        ).fetchone()[0]
        assert _quantile_cont(v, q) == pytest.approx(want, abs=1e-12)
    con.close()


def test_distinct_count_exact(ray_session):
    import pyarrow.parquet as pq

    got = distinct_count(SF_DIR)["n_distinct"][0].as_py()
    users = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
    assert got == len(np.unique(np.asarray(users["user_id"])))


def test_hll_vs_exact_on_events(ray_session):
    est = distinct_count_hll(SF_DIR)["n_distinct_est"][0].as_py()
    exact = distinct_count(SF_DIR)["n_distinct"][0].as_py()
    assert abs(est - exact) / exact < 0.033


def test_group_quantiles_against_numpy(ray_session):
    import pyarrow.parquet as pq

    got = group_quantiles(SF_DIR).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    for etype, g in ev.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        row = got.loc[etype]
        assert row["n"] == len(v)
        scale = 1e6
        assert row["p50"] == np.rint(_quantile_cont(v, 0.5) * scale) / scale
        assert row["p95"] == np.rint(_quantile_cont(v, 0.95) * scale) / scale


def test_kll_big_group_rank_error():
    """A 400k-value group summarized by block-sized KLL partials: merged
    quantile estimates must stay within ~1.5% rank error of exact — the
    VERDICT r3 #5 gate (a group never fits one task at scale)."""
    from ember_ray.pipelines.sketches import KLLSketch

    rng = np.random.default_rng(142)
    vals = rng.lognormal(0.0, 2.0, size=400_000)
    merged = KLLSketch(200)
    for s in range(0, len(vals), 8192):  # one partial per "block"
        part = KLLSketch(200).update(vals[s:s + 8192])
        fv, fl = part.flatten()  # round-trip the wire format
        merged.merge(KLLSketch.from_flat(fv, fl, part.n))
    assert merged.n == len(vals)
    srt = np.sort(vals)
    for q in (0.05, 0.5, 0.95, 0.99):
        est = merged.quantile(q)
        rank = np.searchsorted(srt, est) / len(vals)
        assert abs(rank - q) < 0.015, (q, rank)


def test_kll_merge_order_invariance():
    """Deterministic compaction: the same partials merged in the same
    order reproduce identical estimates run-to-run (O6)."""
    from ember_ray.pipelines.sketches import KLLSketch

    rng = np.random.default_rng(7)
    chunks = [rng.standard_normal(5000) for _ in range(10)]

    def run():
        m = KLLSketch(128)
        for c in chunks:
            m.merge(KLLSketch(128).update(c))
        return [m.quantile(q) for q in (0.25, 0.5, 0.9)]

    assert run() == run()


def test_group_quantiles_sketch_close_to_exact(ray_session):
    """Pipeline parity: sketch path agrees with the exact operator on the
    real events table (small groups -> sketches are near-exact), and the
    group counts are exact."""
    from ember_ray.pipelines.sketches import group_quantiles_sketch

    exact = group_quantiles(SF_DIR).to_pandas().set_index("event_type")
    approx = (group_quantiles_sketch(SF_DIR).to_pandas()
              .set_index("event_type"))
    assert sorted(exact.index) == sorted(approx.index)
    for et in exact.index:
        assert approx.loc[et, "n"] == exact.loc[et, "n"]
        for col in ("p50", "p95"):
            lo, hi = exact.loc[et, "p50"], exact.loc[et, "p95"]
            spread = max(hi - lo, 1e-9)
            err = abs(approx.loc[et, col] - exact.loc[et, col])
            assert err <= 0.15 * spread, (et, col, err, spread)


def test_heavy_hitters_matches_counter(ray_session):
    """Top-20 tokens vs a driver-side exact Counter over the SAME
    tokenizer output, with the (count DESC, token ASC) tie-break."""
    import collections

    import pyarrow.parquet as pq

    from ember_ray.functions.text import tokenize_array
    from ember_ray.pipelines.sketches import heavy_hitters

    got = heavy_hitters(SF_DIR).to_pandas()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    counts = collections.Counter(
        tokenize_array(docs["text"].combine_chunks()).values.to_pylist())
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["token"], got["n"])) == want


def test_heavy_hitters_raises_when_bound_violated(ray_session):
    """A capacity far below the vocabulary working set must raise, not
    silently return a possibly-wrong top-k."""
    import pytest

    from ember_ray.pipelines.sketches import heavy_hitters

    with pytest.raises(ValueError, match="bound violated"):
        heavy_hitters(SF_DIR, k=20, capacity=2)


def test_mg_compress_merge_preserves_bound():
    """Misra-Gries summaries must stay capacity-bounded through a merge
    (concat + group-sum + re-compress) with the undercount bound
    N/capacity intact: every surviving residual underestimates the true
    count by at most (dropped rounds x threshold), and the null row
    carries exact totals."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ember_ray.pipelines.sketches import _mg_compress

    cap = 4
    # two "blocks" with overlapping heavy keys and disjoint light tails
    a = pa.table({"token": pa.array(["hh1", "hh2", "a", "b", "c", "d"]),
                  "n": pa.array([50, 40, 1, 1, 1, 1], pa.int64())})
    b = pa.table({"token": pa.array(["hh1", "hh2", "e", "f", "g"]),
                  "n": pa.array([30, 35, 2, 1, 1], pa.int64())})
    sa = _mg_compress(a, total=94, dropped=0, capacity=cap)
    sb = _mg_compress(b, total=69, dropped=0, capacity=cap)

    cat = pa.concat_tables([sa, sb])
    nulls = cat.filter(pc.is_null(cat["token"]))
    toks = cat.filter(pc.is_valid(cat["token"]))
    g = toks.group_by("token").aggregate([("n", "sum")])
    merged = _mg_compress(
        pa.table({"token": g["token"], "n": g["n_sum"]}),
        total=int(pc.sum(nulls["n"]).as_py()),
        dropped=int(pc.sum(nulls["dropped"]).as_py()), capacity=cap)

    # capacity bound: <= cap residual counters + exactly one null row
    m_nulls = merged.filter(pc.is_null(merged["token"]))
    m_toks = merged.filter(pc.is_valid(merged["token"]))
    assert m_toks.num_rows <= cap and m_nulls.num_rows == 1
    assert int(m_nulls["n"][0].as_py()) == 94 + 69  # exact N
    # the true heavies survive with positive residuals <= true count
    kept = dict(zip(m_toks["token"].to_pylist(),
                    m_toks["n"].to_pylist()))
    true = {"hh1": 80, "hh2": 75}
    for k, v in true.items():
        assert k in kept and 0 < kept[k] <= v
        # undercount bounded by N/capacity
        assert v - kept[k] <= (94 + 69) / cap
    # residuals are all strictly positive (compression removed zeros)
    assert all(x > 0 for x in kept.values())


def _write_events(tmp_path, keys, vals):
    import pyarrow.parquet as pq

    d = tmp_path / "events.parquet"
    d.mkdir()
    t = pa.table({"event_type": pa.array(keys, pa.string()),
                  "value": pa.array(vals, pa.float64())})
    # multi-file dir: exercises multi-block exchange input
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(d / "part-0.parquet"))
    pq.write_table(t.slice(half), str(d / "part-1.parquet"))
    return str(tmp_path)


def test_group_quantiles_million_distinct_keys_exact(ray_session, tmp_path):
    """VERDICT r4 #7 planted test: 10^6 distinct group keys through the
    exact path must come back EXACT (the exchange scales bucket count;
    the kernel is vectorized, no per-group Python)."""
    n_keys, rows = 1_000_000, 2_000_000
    rng = np.random.default_rng(142)
    codes = np.concatenate([np.arange(n_keys),           # every key present
                            rng.integers(0, n_keys, rows - n_keys)])
    keys = np.char.add("k", codes.astype("U7"))
    vals = rng.normal(0, 100, rows)
    sf = _write_events(tmp_path, keys, vals)

    got = group_quantiles(sf).to_pandas().set_index("event_type")
    assert len(got) == n_keys
    assert int(got["n"].sum()) == rows
    # exactness spot-check on a deterministic key sample
    scale = 1e6
    order = np.argsort(codes, kind="stable")
    cs, vs = codes[order], vals[order]
    bounds = np.searchsorted(cs, np.arange(n_keys + 1))
    for kid in rng.integers(0, n_keys, 300):
        g = np.sort(vs[bounds[kid]:bounds[kid + 1]])
        row = got.loc[f"k{kid}"]
        assert row["n"] == len(g)
        assert row["p50"] == np.rint(_quantile_cont(g, 0.5) * scale) / scale
        assert row["p95"] == np.rint(_quantile_cont(g, 0.95) * scale) / scale


def test_group_quantiles_hot_group_raises(ray_session, tmp_path):
    """A single group above the exact-path cap must raise loudly (naming
    the KLL sketch path), never OOM or silently truncate."""
    keys = np.r_[np.repeat("hot", 5000), np.repeat("cold", 10)]
    vals = np.arange(5010, dtype=np.float64)
    sf = _write_events(tmp_path, keys, vals)

    with pytest.raises(Exception, match="group_quantiles_sketch"):
        group_quantiles(sf, group_cap=1000).count()
