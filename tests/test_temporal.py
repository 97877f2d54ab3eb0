"""Temporal operators (as-of join / range join / sessionize): semantics vs
an independent pandas reference, bucket-count invariance, and the packed
(user, ts) key overflow guard."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _assert_matches(ds, ref: pd.DataFrame):
    got = ds.to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(ref), check_dtype=False)


def test_asof_join_matches_pandas_merge_asof(ray_session):
    from ember_ray.pipelines.temporal import asof_join

    ev = _events()
    p = ev[ev.event_type == "purchase"].sort_values("ts")
    v = ev[ev.event_type == "view"].sort_values("ts")
    ref = pd.merge_asof(
        p[["event_id", "user_id", "ts"]],
        v[["user_id", "ts", "value"]].rename(
            columns={"ts": "last_view_ts", "value": "last_view_value"}),
        left_on="ts", right_on="last_view_ts", by="user_id",
        allow_exact_matches=False,
    ).dropna(subset=["last_view_ts"])
    _assert_matches(asof_join(SF_DIR), ref)


def test_range_join_matches_bruteforce(ray_session):
    from ember_ray.pipelines.temporal import range_join
    from ember_ray.pipelines.temporal import RANGE_WINDOW_US

    ev = _events()
    p = ev[ev.event_type == "purchase"]
    c = ev[ev.event_type == "click"]
    rows = []
    for _, r in p.iterrows():  # brute force is the point of the oracle
        w = c[(c.user_id == r.user_id)
              & (c.ts >= r.ts - pd.Timedelta(microseconds=RANGE_WINDOW_US))
              & (c.ts < r.ts)]
        rows.append((r.event_id, r.user_id, r.ts, len(w),
                     np.rint(w.value.sum() * 100) / 100))
    ref = pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ts", "n_prior_24h", "sum_value_24h"])
    _assert_matches(range_join(SF_DIR), ref)


def test_sessionize_matches_pandas(ray_session):
    from ember_ray.pipelines.temporal import SESSION_GAP_US, sessionize

    ev = _events().sort_values(["user_id", "ts"])
    gap = pd.Timedelta(microseconds=SESSION_GAP_US)
    brk = (ev.groupby("user_id")["ts"].diff() > gap) | \
        ev["user_id"].ne(ev["user_id"].shift())
    ev = ev.assign(_s=brk.cumsum())
    ref = ev.groupby(["user_id", "_s"], sort=True).agg(
        session_start=("ts", "min"), session_end=("ts", "max"),
        n_events=("ts", "size"), sum_value=("value", "sum"),
    ).reset_index()
    ref["sum_value"] = np.rint(ref["sum_value"] * 100) / 100
    ref["session_seq"] = ref.groupby("user_id").cumcount() + 1
    ref = ref.drop(columns="_s")
    _assert_matches(sessionize(SF_DIR), ref)


def test_bucket_count_invariance(ray_session):
    """Results must not depend on the exchange fan-out (partitioning is an
    executor choice, not a semantic)."""
    import ember_ray.pipelines.temporal as t

    base = _sorted(t.sessionize(SF_DIR).to_pandas())
    orig = t.bucketed_group_map

    def forced(ds, key, fn, num_buckets, **kw):
        return orig(ds, key=key, fn=fn, num_buckets=7, **kw)

    t.bucketed_group_map = forced
    try:
        alt = _sorted(t.sessionize(SF_DIR).to_pandas())
    finally:
        t.bucketed_group_map = orig
    pd.testing.assert_frame_equal(base, alt)


def test_packed_key_overflow_guard():
    from ember_ray.pipelines.temporal import _key_layout

    users = np.arange(1 << 21, dtype=np.int64)
    ts = np.array([0, (1 << 44) - 1], dtype=np.int64)  # 44-bit range
    with pytest.raises(ValueError, match="overflow"):
        _key_layout(users, users[:0], ts)


def test_rolling_agg_matches_python_recompute(ray_session):
    """Per-row window values recomputed with the same left-to-right float
    accumulation and half-up rounding the kernel (and oracle) use."""
    from ember_ray.pipelines.temporal import ROLL_PRECEDING, rolling_agg

    ev = _events().sort_values(["user_id", "ts", "event_id"])
    rows = []
    for _, g in ev.groupby("user_id", sort=False):
        vals = g["value"].to_numpy(np.float64)
        for i in range(len(g)):
            lo = max(0, i - ROLL_PRECEDING)
            s = 0.0
            for x in vals[lo:i + 1]:  # oldest-first, same as the kernel
                s += x
            n = i + 1 - lo
            rows.append((g["event_id"].iloc[i], g["user_id"].iloc[i],
                         g["ts"].iloc[i], n,
                         np.floor(s * 100 + 0.5) / 100,
                         np.floor(s / n * 100 + 0.5) / 100))
    ref = pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ts", "roll_n", "roll_sum", "roll_mean"])
    _assert_matches(rolling_agg(SF_DIR), ref)


def test_event_rank_matches_pandas(ray_session):
    from ember_ray.pipelines.temporal import event_rank

    ev = _events().sort_values(
        ["user_id", "value", "event_id"], ascending=[True, False, True])
    ref = pd.DataFrame({
        "event_id": ev["event_id"].to_numpy(),
        "user_id": ev["user_id"].to_numpy(),
        "value_row_number": ev.groupby("user_id").cumcount().to_numpy() + 1,
        "value_dense_rank": ev.groupby("user_id")["value"]
        .rank(method="dense", ascending=False).to_numpy(np.int64),
    })
    _assert_matches(event_rank(SF_DIR), ref)


def test_session_funnel_planted_sequences(ray_session, tmp_path):
    """Hand-built sessions covering every stage: no view (0), view only
    (1), view→click (2), full funnel (3), and an OUT-OF-ORDER
    click-before-view session that must NOT advance past stage 1."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.pipelines.temporal import session_funnel

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute
    rows = [
        # user 1, session 1: full ordered funnel -> 3
        (1, t0 + 0 * m, "view"), (1, t0 + 1 * m, "click"),
        (1, t0 + 2 * m, "purchase"),
        # user 2, session 1: click BEFORE view -> stage 1 (order matters)
        (2, t0 + 0 * m, "click"), (2, t0 + 1 * m, "view"),
        # user 2, session 2 (after the 6h gap): view, click -> 2
        (2, t0 + 500 * m, "view"), (2, t0 + 501 * m, "click"),
        # user 3: errors only -> 0
        (3, t0 + 0 * m, "error"), (3, t0 + 1 * m, "error"),
    ]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.array([r[0] for r in rows], np.int64),
        "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
        "event_type": [r[2] for r in rows],
        "value": np.ones(len(rows)),
    })
    d = tmp_path / "events.parquet"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), str(d / "part-0.parquet"))
    out = (session_funnel(str(tmp_path)).to_pandas()
           .set_index(["user_id", "session_seq"])["stage"].sort_index())
    assert out.loc[(1, 1)] == 3
    assert out.loc[(2, 1)] == 1
    assert out.loc[(2, 2)] == 2
    assert out.loc[(3, 1)] == 0


def test_event_gaps_lag_parity(ray_session):
    """gap_us must equal the DuckDB LAG window; first event per user -1."""
    import duckdb

    from ember_ray.pipelines.temporal import event_gaps

    sf = "/root/testdata/sf0.001"
    got = (event_gaps(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("SET threads=2")
    want = con.execute(
        "SELECT event_id, coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us "
        f"FROM read_parquet('{sf}/events.parquet') ORDER BY event_id").df()
    con.close()
    assert (got["event_id"].values == want["event_id"].values).all()
    assert (got["gap_us"].values == want["gap_us"].astype("int64").values).all()
    # every user's earliest event must be the -1 row
    first = got.loc[got.groupby("user_id")["event_id"].idxmin()]
    assert len(got[got.gap_us == -1]) >= got["user_id"].nunique()
