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
