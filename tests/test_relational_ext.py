"""Pivot / left-outer-join operators vs direct DuckDB at sf0.001."""

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    con.execute("SET threads=2")
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    out = con.execute(sql).df()
    con.close()
    return out


def test_pivot_counts_matches_sql(ray_session):
    from ember_ray.pipelines.relational import pivot_counts

    got = pivot_counts(SF_DIR).to_pandas().sort_values("user_id")
    want = _duck(
        "SELECT user_id, "
        + ", ".join(
            f"count(*) FILTER (WHERE event_type = '{t}') AS {t}"
            for t in ("click", "error", "purchase", "signup", "view"))
        + " FROM events GROUP BY user_id ORDER BY user_id")
    assert got.reset_index(drop=True).astype("int64").equals(
        want.astype("int64"))


def test_left_join_counts_keeps_unmatched(ray_session):
    from ember_ray.pipelines.relational import left_join_counts

    got = (left_join_counts(SF_DIR).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    want = _duck(
        "SELECT c.c_custkey, c.c_mktsegment, "
        "coalesce(e.n_events, 0) AS n_events FROM customer c LEFT JOIN "
        "(SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)"
        " e ON c.c_custkey = e.user_id ORDER BY c.c_custkey")
    assert (got["n_events"] == 0).any(), "left join must keep unmatched rows"
    assert got[["c_custkey", "c_mktsegment"]].equals(
        want[["c_custkey", "c_mktsegment"]])
    assert got["n_events"].astype("int64").equals(
        want["n_events"].astype("int64"))


def test_hash_join_native_wrapper(ray_session):
    """util.hash_join (native Dataset.join + empty-block workarounds) —
    kept as the API-diversity path after join_agg moved to the raw-task
    bucketed_join; this test keeps its edge cases covered."""
    import pyarrow as pa
    import ray.data as rd

    from ember_ray.util import hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 5], pa.int64()),
        "lv": pa.array(["a", "b", "c", "e"]),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3, 4], pa.int64()),
        "rv": pa.array([20.0, 30.0, 40.0]),
    }))
    out = (hash_join(left, right, on="k", right_on="rk", num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == [2, 3]
    assert list(out["lv"]) == ["b", "c"]
    assert list(out["rv"]) == [20.0, 30.0]

    # empty right side: inner join yields 0 rows with the full schema
    empty = rd.from_arrow(pa.table({
        "rk": pa.array([], pa.int64()), "rv": pa.array([], pa.float64())}))
    out2 = hash_join(left, empty, on="k", right_on="rk")
    assert out2.count() == 0
    assert set(out2.schema().names) == {"k", "lv", "rv"}


def test_exchange_raises_on_missing_key(ray_session):
    """ADVICE r2: a non-empty block missing the exchange key must raise,
    not silently drop rows via the empty-slices fallback."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ember_ray.util import bucketed_group_map

    ds = rd.from_arrow(pa.table({"a": pa.array([1, 2, 3], pa.int64())}))
    with pytest.raises(Exception) as ei:
        bucketed_group_map(ds, "missing_key", lambda df: df,
                           num_buckets=2).count()
    assert "missing_key" in str(ei.value)


def test_empty_blocks_pass_exchange(ray_session):
    """0-row blocks (no key column needed) must flow through unharmed."""
    import pyarrow as pa
    import ray.data as rd

    from ember_ray.util import bucketed_group_map

    t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([10, 20, 30], pa.int64())})
    ds = rd.from_arrow(t).repartition(8)  # forces some 0-row blocks
    out = bucketed_group_map(
        ds, "k",
        lambda df: df.groupby("k", as_index=False)["v"].sum(),
        num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 2]
    assert list(out["v"]) == [30, 30]


def test_bucketed_semi_anti_parity(ray_session):
    """threshold=0 forces the bucketed exchange path (VERDICT r3 #3):
    results must equal the broadcast key-set path exactly."""
    from ember_ray.pipelines.relational import anti_join, semi_join

    for fn in (semi_join, anti_join):
        bc = (fn(SF_DIR).to_pandas()
              .sort_values("c_custkey").reset_index(drop=True))
        bucketed = (fn(SF_DIR, broadcast_threshold=0).to_pandas()
                    .sort_values("c_custkey").reset_index(drop=True))
        assert len(bc) > 0
        assert bucketed.equals(bc), fn.__name__


def test_bucketed_semi_join_empty_build_side(ray_session):
    """Empty build side: semi keeps nothing, anti keeps everything."""
    import pyarrow as pa
    import ray.data as rd

    from ember_ray.util import bucketed_semi_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                                   "v": pa.array(["a", "b", "c"])}))
    right = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    semi = bucketed_semi_join(left, right, on="k").to_pandas()
    anti = bucketed_semi_join(left, right, on="k", anti=True).to_pandas()
    assert len(semi) == 0
    assert sorted(anti["k"]) == [1, 2, 3]


def test_sliding_window_membership(ray_session):
    """Every event must appear in exactly window/slide = 4 overlapping
    windows: total count across windows is 4x the event count, and each
    window's span covers its members."""
    import pyarrow.parquet as pq

    from ember_ray.pipelines.relational import sliding_window_agg

    sf = "/root/testdata/sf0.001"
    out = sliding_window_agg(sf).to_pandas()
    n_events = pq.read_table(f"{sf}/events.parquet", columns=["event_id"]).num_rows
    assert int(out["n"].sum()) == 4 * n_events
    # window starts land on the 15-minute grid
    assert (out["window_start"].astype("int64") % (15 * 60 * 1_000_000) == 0).all()


def _duck_tpch(sql):
    con = duckdb.connect()
    con.execute("SET threads=2")
    for t in ("events", "customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    out = con.execute(sql).df()
    con.close()
    return out


def test_join_rows_matches_sql(ray_session):
    from ember_ray.pipelines.relational import join_rows

    keys = ["o_orderkey", "l_linenumber"]
    got = (join_rows(SF_DIR).to_pandas()
           .sort_values(keys).reset_index(drop=True))
    want = _duck_tpch(
        "SELECT o_orderkey, o_custkey, o_orderpriority, l_linenumber, "
        "l_quantity, l_extendedprice FROM orders "
        "JOIN lineitem ON o_orderkey = l_orderkey WHERE l_quantity >= 49 "
        "ORDER BY o_orderkey, l_linenumber")
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c


def test_full_join_counts_covers_both_null_sides(ray_session):
    from ember_ray.pipelines.relational import full_join_counts

    got = (full_join_counts(SF_DIR).to_pandas()
           .sort_values("custkey").reset_index(drop=True))
    want = _duck_tpch(
        "WITH oc AS (SELECT o_custkey AS custkey, count(*) AS n_orders "
        "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1), "
        "ec AS (SELECT user_id AS custkey, count(*) AS n_events "
        "FROM events WHERE event_type = 'purchase' GROUP BY 1) "
        "SELECT coalesce(oc.custkey, ec.custkey) AS custkey, "
        "coalesce(n_orders, 0) AS n_orders, coalesce(n_events, 0) AS n_events "
        "FROM oc FULL OUTER JOIN ec ON oc.custkey = ec.custkey "
        "ORDER BY custkey")
    # the join type is only exercised if both unmatched sides appear
    assert (got["n_orders"] == 0).any(), "event-only users must survive"
    assert (got["n_events"] == 0).any(), "order-only customers must survive"
    for c in want.columns:
        assert (got[c].astype("int64").values
                == want[c].astype("int64").values).all(), c


def test_rollup_agg_levels_are_consistent(ray_session):
    from ember_ray.pipelines.relational import rollup_agg

    got = rollup_agg(SF_DIR).to_pandas()
    want = _duck_tpch(
        "WITH e AS (SELECT event_type, "
        "(epoch_us(ts) // 86400000000 + 4) % 7 AS dow FROM events) "
        "SELECT coalesce(event_type, 'ALL') AS event_type, "
        "coalesce(dow, -1) AS dow, count(*) AS n_events "
        "FROM e GROUP BY ROLLUP(event_type, dow)")
    key = ["event_type", "dow"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["n_events"].values == w["n_events"].astype("int64").values).all()
    # internal consistency: finest level sums to each rollup level
    base = got[(got.event_type != "ALL") & (got.dow >= 0)]
    lvl1 = got[(got.event_type != "ALL") & (got.dow == -1)]
    total = got[got.event_type == "ALL"]["n_events"].iloc[0]
    assert base["n_events"].sum() == total
    assert lvl1["n_events"].sum() == total


def test_json_extract_agg_matches_sql(ray_session):
    from ember_ray.pipelines.relational import json_extract_agg

    got = json_extract_agg(SF_DIR).to_pandas().sort_values(
        "event_type").reset_index(drop=True)
    want = _duck_tpch(
        "WITH e AS (SELECT event_type, CAST(regexp_extract(props, "
        "'\"k\": (\\d+)', 1) AS BIGINT) AS k FROM events) "
        "SELECT event_type, sum(k) AS sum_k, min(k) AS min_k, "
        "max(k) AS max_k, count(*) AS n FROM e GROUP BY event_type "
        "ORDER BY event_type")
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c


def test_latest_order_one_row_per_customer(ray_session):
    from ember_ray.pipelines.relational import latest_order

    got = latest_order(SF_DIR).to_pandas().sort_values(
        "o_custkey").reset_index(drop=True)
    want = _duck_tpch(
        "SELECT o_custkey, o_orderkey, o_orderdate FROM (SELECT *, "
        "row_number() OVER (PARTITION BY o_custkey ORDER BY "
        "o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) "
        "WHERE rn = 1 ORDER BY o_custkey")
    assert got["o_custkey"].is_unique
    assert len(got) == len(want)
    for c in ("o_custkey", "o_orderkey"):
        assert (got[c].values == want[c].values).all(), c
    assert (got["o_orderdate"].values == want["o_orderdate"].values).all()


def test_value_quartiles_ntile_arithmetic_small_groups(ray_session):
    """DuckDB-identical NTILE on groups smaller than the bucket count —
    the eager-np.where edge the vectorized kernel must not trip on."""
    import numpy as np
    import pandas as pd

    from ember_ray.pipelines.relational import value_quartiles

    got = value_quartiles(SF_DIR).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    want = _duck_tpch(
        "SELECT event_id, CAST(ntile(4) OVER (PARTITION BY event_type "
        "ORDER BY value, event_id) AS BIGINT) AS quartile FROM events "
        "ORDER BY event_id")
    assert (got["event_id"].values == want["event_id"].values).all()
    assert (got["quartile"].values == want["quartile"].values).all()
    # quartiles are equal-height per type (sizes differ by at most 1)
    sizes = got.groupby(["event_type", "quartile"]).size()
    for t, grp in sizes.groupby(level=0):
        assert grp.max() - grp.min() <= 1, t


def test_above_median_orders_matches_sql(ray_session):
    from ember_ray.pipelines.relational import above_median_orders

    got = (above_median_orders(SF_DIR).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    want = _duck_tpch(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM (SELECT *, "
        "median(o_totalprice) OVER (PARTITION BY o_custkey) AS med "
        "FROM orders) WHERE o_totalprice > med ORDER BY o_orderkey")
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c


def test_corr_by_type_matches_exact_recompute(ray_session):
    """corr from exact integer moment sums must equal a direct driver
    recompute (np.corrcoef) to ~1e-12 and the sign/structure must hold."""
    import numpy as np
    import pyarrow.parquet as pq

    from ember_ray.pipelines.relational import corr_by_type

    got = corr_by_type(SF_DIR).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_type", "value", "props"]).to_pandas()
    ev["x"] = np.rint(ev["value"].to_numpy() * 100).astype("int64")
    ev["y"] = ev["props"].str.extract(r'"k": (\d+)').astype("int64")
    for t, grp in ev.groupby("event_type"):
        want = np.corrcoef(grp["x"], grp["y"])[0, 1]
        assert abs(got.loc[t, "corr_vk"] - want) < 1e-6, t
        assert got.loc[t, "n"] == len(grp)


def test_global_rank_parallelism_invariant(ray_session):
    """rn must equal the DuckDB row_number regardless of block layout —
    pins the sorted-block-order invariant the two-phase rank relies on."""
    import duckdb

    from ember_ray.pipelines.relational import global_rank

    got = (global_rank(SF_DIR).to_pandas()
           .sort_values("rn").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("SET threads=2")
    want = con.execute(
        "SELECT doc_id, n_chars, row_number() OVER (ORDER BY n_chars DESC, "
        f"doc_id) AS rn FROM read_parquet('{SF_DIR}/documents.parquet') "
        "ORDER BY rn").df()
    con.close()
    assert (got["rn"].values == want["rn"].astype("int64").values).all()
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert got["rn"].iloc[0] == 1 and got["rn"].is_unique


def test_unpivot_roundtrips_pivot(ray_session):
    """melt(pivot(events)) must equal the direct long-form aggregate,
    with zero cells absent."""
    from ember_ray.pipelines.relational import unpivot_counts

    got = (unpivot_counts(SF_DIR).to_pandas()
           .sort_values(["user_id", "event_type"]).reset_index(drop=True))
    want = _duck_tpch(
        "SELECT user_id, event_type, count(*) AS n FROM events "
        "GROUP BY user_id, event_type ORDER BY user_id, event_type")
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c
    assert (got["n"] > 0).all()


def test_global_deciles_equal_height(ray_session):
    import duckdb

    from ember_ray.pipelines.relational import global_deciles

    got = global_deciles(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.execute("SET threads=2")
    want = con.execute(
        "SELECT doc_id, CAST(ntile(10) OVER (ORDER BY n_chars DESC, doc_id)"
        f" AS BIGINT) AS decile FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id").df()
    con.close()
    g = got.sort_values("doc_id").reset_index(drop=True)
    assert (g["decile"].values == want["decile"].values).all()
    sizes = got.groupby("decile").size()
    assert sizes.max() - sizes.min() <= 1


def test_validate_constraints_detects_planted_violations(ray_session):
    """On the clean corpus every check is 0; on a corpus with PLANTED
    violations (dup event_ids, dangling FK, out-of-range quantity, null
    text) each check must report the exact planted count."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.pipelines.relational import validate_constraints

    rep = validate_constraints(SF_DIR).to_pandas().set_index("check_name")
    assert set(rep.index) == {"fk_orders_customer",
                              "range_lineitem_quantity",
                              "unique_events_event_id",
                              "notnull_documents_text"}
    assert (rep["n_violations"] == 0).all()

    bad_dir = "/tmp/ember_ray_test_validate"
    shutil.rmtree(bad_dir, ignore_errors=True)
    os.makedirs(bad_dir)
    for t in ("customer", "orders", "lineitem", "events", "documents"):
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "events":  # 3 duplicate event_ids
            tbl = pa.concat_tables([tbl, tbl.slice(0, 3)])
        elif t == "orders":  # 2 dangling custkeys
            bad = tbl.slice(0, 2).set_column(
                tbl.schema.get_field_index("o_custkey"), "o_custkey",
                pa.array([10**9, 10**9 + 1], pa.int64()))
            tbl = pa.concat_tables([tbl, bad])
        elif t == "lineitem":  # 1 out-of-range quantity
            bad = tbl.slice(0, 1).set_column(
                tbl.schema.get_field_index("l_quantity"), "l_quantity",
                pa.array([99.0], pa.float64()))
            tbl = pa.concat_tables([tbl, bad])
        elif t == "documents":  # 4 null texts
            bad = tbl.slice(0, 4).set_column(
                tbl.schema.get_field_index("text"), "text",
                pa.array([None] * 4, tbl.schema.field("text").type))
            tbl = pa.concat_tables([tbl, bad])
        pq.write_table(tbl, f"{bad_dir}/{t}.parquet")
    bad_rep = (validate_constraints(bad_dir).to_pandas()
               .set_index("check_name")["n_violations"])
    assert bad_rep["unique_events_event_id"] == 3
    assert bad_rep["fk_orders_customer"] == 2
    assert bad_rep["range_lineitem_quantity"] == 1
    assert bad_rep["notnull_documents_text"] == 4
    shutil.rmtree(bad_dir, ignore_errors=True)


def test_table_diff_classes_partition_ids(ray_session):
    """added/removed/changed must exactly follow the simulation rules."""
    from ember_ray.pipelines.relational import table_diff

    got = table_diff(SF_DIR).to_pandas()
    by = {c: set(g["doc_id"]) for c, g in got.groupby("change")}
    assert all(d >= 10_000_000 for d in by.get("added", set()))
    assert all(d % 13 == 0 for d in by.get("removed", set()))
    assert all(d % 7 == 0 and d % 13 != 0 for d in by.get("changed", set()))
    assert by.get("added") and by.get("removed") and by.get("changed")
    assert not (by["added"] & by["removed"]) and not (
        by["removed"] & by["changed"])


def test_key_skew_report_counts(ray_session):
    import pyarrow.parquet as pq

    from ember_ray.pipelines.relational import key_skew_report

    rep = key_skew_report(SF_DIR).to_pandas().set_index("key")
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["user_id"]).to_pandas()
    assert rep.loc["events.user_id", "n_keys"] == ev["user_id"].nunique()
    assert rep.loc["events.user_id", "total_rows"] == len(ev)
    vc = ev["user_id"].value_counts()
    assert rep.loc["events.user_id", "max_group"] == vc.max()
    assert rep.loc["events.event_type", "n_keys"] == 5


def test_upsert_merge_is_diff_applied(ray_session):
    """merge(v1, feed) must contain no removed ids, every added id, and
    the changed rows must carry a DIFFERENT fingerprint than v1."""
    import hashlib

    import pyarrow.parquet as pq

    from ember_ray.pipelines.relational import table_diff, upsert_merge

    merged = upsert_merge(SF_DIR).to_pandas().set_index("doc_id")
    diff = table_diff(SF_DIR).to_pandas()
    removed = set(diff[diff.change == "removed"]["doc_id"])
    added = set(diff[diff.change == "added"]["doc_id"])
    changed = set(diff[diff.change == "changed"]["doc_id"])
    assert not (removed & set(merged.index))
    assert added <= set(merged.index)
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    v1fp = {r.doc_id: hashlib.md5(r.text.encode()).hexdigest()
            for r in docs.itertuples()}
    for d in changed:
        assert merged.loc[d, "fp"] != v1fp[d]
    # untouched rows keep their v1 fingerprint
    untouched = set(merged.index) - added - changed
    for d in list(sorted(untouched))[:20]:
        assert merged.loc[d, "fp"] == v1fp[d]


def test_cooccurrence_pairs_symmetric_canonical(ray_session):
    from ember_ray.pipelines.relational import cooccurrence_pairs

    got = cooccurrence_pairs(SF_DIR).to_pandas()
    assert (got["u1"] < got["u2"]).all()
    assert not got.duplicated(["u1", "u2"]).any()
    assert (got["n"] >= 1).all() and len(got) > 0


def test_table_profile_native_minmax(ray_session):
    """min/max must reduce in native type — '99' vs '100' is the trap."""
    import pyarrow.parquet as pq

    from ember_ray.pipelines.relational import table_profile

    rep = table_profile(SF_DIR).to_pandas().set_index("column")
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    assert rep.loc["doc_id", "min_v"] == str(docs["doc_id"].min())
    assert rep.loc["doc_id", "max_v"] == str(docs["doc_id"].max())
    assert rep.loc["n_chars", "min_v"] == str(docs["n_chars"].min())
    assert rep.loc["lang", "n_distinct"] == docs["lang"].nunique()
    assert (rep["n_nulls"] == 0).all()


def test_group_size_histogram_total(ray_session):
    import pyarrow.parquet as pq

    from ember_ray.pipelines.relational import group_size_histogram

    got = group_size_histogram(SF_DIR).to_pandas()
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["user_id"]).to_pandas()
    assert got["n_users"].sum() == ev["user_id"].nunique()
    assert (got["n_events"] * got["n_users"]).sum() == len(ev)


def test_cooccurrence_hot_cell_dropped_and_counted(ray_session, tmp_path):
    """A planted cell above max_cell (512 distinct users) must be dropped
    on BOTH sides (kernel cap == oracle cap) and fire the oversize-drop
    counter — never a silent candidate loss (ADVICE r4 high)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.pipelines.relational import cooccurrence_pairs
    from ember_ray.state.stats import drop_counts, reset_drop_counts

    hot_users = list(range(600))          # one hot (click, day0) cell
    ok_users = [1000, 1001, 1002]         # one small (view, day0) cell
    n = len(hot_users) + len(ok_users)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([0] * n, pa.timestamp("us")),
        "user_id": pa.array(hot_users + ok_users, pa.int64()),
        "event_type": pa.array(
            ["click"] * len(hot_users) + ["view"] * len(ok_users)),
        "value": pa.array([0.0] * n),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    reset_drop_counts()
    got = cooccurrence_pairs(str(tmp_path)).to_pandas()
    # only the 3-user cell's pairs survive: (1000,1001),(1000,1002),(1001,1002)
    assert sorted(map(tuple, got[["u1", "u2"]].values.tolist())) == [
        (1000, 1001), (1000, 1002), (1001, 1002)]
    c = drop_counts()["cooccurrence"]
    assert c["blocks"] == 1 and c["rows"] == 600 and c["policy"] == "drop"


def test_table_profile_single_pass_and_null_blocks(ray_session, tmp_path):
    """VERDICT r4 #4 + ADVICE r4: (a) the profile reads the table ONCE —
    a per-batch read counter must total exactly n_rows; (b) a block whose
    column is entirely null must not coerce the typed min/max reduce
    (int min renders '5', never '5.0'), and an all-null column renders
    None."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ember_ray.pipelines.relational as rel
    from ember_ray.state.stats import drop_counts, reset_drop_counts

    d = tmp_path / "documents.parquet"
    d.mkdir()
    # file 0: n_chars entirely null; lang entirely null in BOTH files
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.nulls(3, pa.string()),
        "n_chars": pa.nulls(3, pa.int64())}), str(d / "part-0.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "lang": pa.nulls(2, pa.string()),
        "n_chars": pa.array([9, 5], pa.int64())}), str(d / "part-1.parquet"))

    orig = rel._rp
    reset_drop_counts()

    def counting(sf_dir, table, columns=None):
        from ember_ray.state.stats import report_oversize

        def count_rows(t: pa.Table) -> pa.Table:
            report_oversize("profile_read", 1, t.num_rows, "count")
            return t

        return orig(sf_dir, table, columns=columns).map_batches(
            count_rows, batch_format="pyarrow", zero_copy_batch=True)

    rel._rp = counting
    try:
        rep = rel.table_profile(str(tmp_path)).to_pandas().set_index("column")
    finally:
        rel._rp = orig
    assert drop_counts()["profile_read"]["rows"] == 5  # exactly one pass
    assert rep.loc["n_chars", "min_v"] == "5"          # not '5.0'
    assert rep.loc["n_chars", "max_v"] == "9"
    assert rep.loc["n_chars", "n_nulls"] == 3
    assert rep.loc["n_chars", "n_distinct"] == 2
    assert rep.loc["lang", "min_v"] is None and rep.loc["lang", "n_nulls"] == 5
    assert rep.loc["lang", "n_distinct"] == 0
    assert rep.loc["doc_id", "min_v"] == "1" and rep.loc["doc_id", "max_v"] == "11"
