"""Temporal custom operators Ray Data lacks natively: as-of join, range
join, and session windows over the ``events`` table.

All three share one partitioning assumption (documented per SURVEY §2.10):
**co-partition by the entity key** (``user_id``) via the raw-task hash
exchange (`util.bucketed_group_map`), then solve each bucket with one
vectorized numpy kernel — sort once by a packed ``(user, ts)`` uint64 key,
answer every probe with ``np.searchsorted``. No per-group Python, no
driver materialization; bucket count auto-sizes from input bytes so a
bucket always fits a worker at any scale.

Packed-key layout: ``rank(user) << shift | (ts - ts_base)`` where ``shift``
is the bit width of the bucket's timestamp range. Lexicographic order of
the packed keys equals ``(user, ts)`` order, so one ``np.sort`` replaces a
two-key lexsort (~10× — see CLAUDE.md) and range probes cannot cross a
user boundary (the rank bits dominate). The layout is validated per
bucket and raises when ``n_users << shift`` would overflow 64 bits — at
that point the fix is more buckets (narrower per-bucket key range), which
the byte-based auto-sizing already forces long before.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bucketed_group_map

_EV_COLS = ["event_id", "ts", "user_id", "event_type", "value"]

# as-of: latest 'view' strictly before each 'purchase' (same user).
# range: 'click' activity in the 24h window before each 'purchase'.
# sessions: per-user event runs split on gaps > 6h.
RANGE_WINDOW_US = 24 * 3600 * 1_000_000
SESSION_GAP_US = 6 * 3600 * 1_000_000


def _read_events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=_EV_COLS
    )


def _ts_us(s: pd.Series) -> np.ndarray:
    return s.to_numpy().astype("datetime64[us]").astype(np.int64)


def _us_series(a: np.ndarray) -> pd.Series:
    return pd.Series(a.astype("datetime64[us]"))


def _pack(users: np.ndarray, ts_off: np.ndarray, uniq: np.ndarray,
          shift: int) -> np.ndarray:
    """uint64 ``rank(user) << shift | ts_off`` — order == (user, ts)."""
    rank = np.searchsorted(uniq, users).astype(np.uint64)
    return (rank << np.uint64(shift)) | ts_off.astype(np.uint64)


def _key_layout(users_l, users_r, *ts_arrays):
    """Shared (uniq_users, shift, ts_base) for one bucket's probe space."""
    uniq = np.unique(np.concatenate([users_l, users_r]))
    lo = min(int(a.min()) for a in ts_arrays if len(a))
    hi = max(int(a.max()) for a in ts_arrays if len(a))
    shift = max(1, int(hi - lo).bit_length())
    if (len(uniq) >> (64 - shift)) > 0:
        raise ValueError(
            f"packed (user, ts) key overflow: {len(uniq)} users x "
            f"{shift}-bit ts range in one bucket — raise num_buckets"
        )
    return uniq, shift, lo


# ------------------------------------------------------------- as-of join
def asof_join(sf_dir: str):
    """As-of join (beyond the reference; the op Ray Data has no native
    form of): each 'purchase' event picks up the latest 'view' by the
    same user strictly before it. Matched purchases only (inner as-of).

    One hash exchange on ``user_id``; per bucket the view side is sorted
    once by the packed key and every purchase resolves with a single
    ``searchsorted`` (last key < probe). Ties between duplicate
    (user_id, ts) views resolve to max(event_id) — the view side is
    stable-sorted by event_id BEFORE the packed-key sort, so "last key
    below the probe" is deterministic regardless of input block order
    (ADVICE r3 #4; DuckDB's native ASOF JOIN picks an unspecified row
    among equal-ts matches, so the oracle uses an explicit
    row_number() window instead).
    """
    out_cols = {
        "event_id": "int64", "user_id": "int64", "ts": "datetime64[us]",
        "last_view_ts": "datetime64[us]", "last_view_value": "float64",
    }

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["event_type"] == "purchase"]
        r = df[df["event_type"] == "view"]
        if not len(l) or not len(r):
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in out_cols.items()})
        lu = l["user_id"].to_numpy(np.int64)
        ru = r["user_id"].to_numpy(np.int64)
        lts, rts = _ts_us(l["ts"]), _ts_us(r["ts"])
        uniq, shift, base = _key_layout(lu, ru, lts, rts)
        rk = _pack(ru, rts - base, uniq, shift)
        # two stable sorts == lexsort((event_id, rk)): equal-key views end
        # up event_id-ascending, so pos-1 picks max(event_id) among ties
        sec = np.argsort(r["event_id"].to_numpy(np.int64), kind="stable")
        order = sec[np.argsort(rk[sec], kind="stable")]
        rk = rk[order]
        # last view key strictly below the probe; a hit in the previous
        # user's rank band means "no prior view for this user" -> drop
        pos = np.searchsorted(rk, _pack(lu, lts - base, uniq, shift),
                              side="left") - 1
        valid = pos >= 0
        hit = order[np.maximum(pos, 0)]
        valid &= ru[hit] == lu
        hit = hit[valid]
        return pd.DataFrame({
            "event_id": l["event_id"].to_numpy(np.int64)[valid],
            "user_id": lu[valid],
            "ts": _us_series(lts[valid]),
            "last_view_ts": _us_series(rts[hit]),
            "last_view_value": r["value"].to_numpy(np.float64)[hit],
        })

    return bucketed_group_map(
        _read_events(sf_dir), key="user_id", fn=per_bucket, num_buckets=None
    )


# ------------------------------------------------------------- range join
def range_join(sf_dir: str):
    """Time-range join + aggregate: for each 'purchase', the count and
    value sum of the same user's 'click' events in ``[ts-24h, ts)``.

    Same bucket kernel family as :func:`asof_join`: two ``searchsorted``
    probes bound the window, counts are index differences and sums come
    from ``np.add.reduceat`` over the sorted click values (per-window
    left-to-right sums, NOT prefix-sum differences — keeps float error at
    the oracle's own accumulation scale for the shared rint rounding
    recipe). Zero-match purchases emit (0, 0.0) — no nulls.
    """
    out_cols = {
        "event_id": "int64", "user_id": "int64", "ts": "datetime64[us]",
        "n_prior_24h": "int64", "sum_value_24h": "float64",
    }

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["event_type"] == "purchase"]
        if not len(l):
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in out_cols.items()})
        r = df[df["event_type"] == "click"]
        lu = l["user_id"].to_numpy(np.int64)
        lts = _ts_us(l["ts"])
        eid = l["event_id"].to_numpy(np.int64)
        if not len(r):
            n = np.zeros(len(l), np.int64)
            s = np.zeros(len(l), np.float64)
        else:
            ru = r["user_id"].to_numpy(np.int64)
            rts = _ts_us(r["ts"])
            uniq, shift, base = _key_layout(
                lu, ru, lts, rts, lts - RANGE_WINDOW_US)
            rk = _pack(ru, rts - base, uniq, shift)
            order = np.argsort(rk, kind="stable")
            rk = rk[order]
            rv = r["value"].to_numpy(np.float64)[order]
            lo = np.searchsorted(
                rk, _pack(lu, lts - RANGE_WINDOW_US - base, uniq, shift),
                side="left")
            hi = np.searchsorted(
                rk, _pack(lu, lts - base, uniq, shift), side="left")
            n = (hi - lo).astype(np.int64)
            vp = np.concatenate([rv, [0.0]])  # sentinel: segment may start at len(rv)
            idx = np.empty(2 * len(l), np.intp)
            idx[0::2], idx[1::2] = lo, hi
            s = np.add.reduceat(vp, idx)[0::2]
            s[n == 0] = 0.0  # reduceat quirk: empty segment returns vp[lo]
        scale = 100.0
        return pd.DataFrame({
            "event_id": eid, "user_id": lu, "ts": _us_series(lts),
            "n_prior_24h": n,
            "sum_value_24h": np.rint(s * scale) / scale,
        })

    return bucketed_group_map(
        _read_events(sf_dir), key="user_id", fn=per_bucket, num_buckets=None
    )


# -------------------------------------------------- rolling window aggregate
ROLL_PRECEDING = 3  # ROWS BETWEEN 3 PRECEDING AND CURRENT ROW


def rolling_agg(sf_dir: str):
    """Per-user rolling ROWS-window aggregate (the analytic window class
    the tumbling `window_agg` doesn't cover): for every event, the count /
    sum / mean of ``value`` over the user's last 4 events (3 preceding +
    current) ordered by ``(ts, event_id)``.

    Same partitioning contract as the other temporal ops: one hash
    exchange on ``user_id``; per bucket a single packed-key sort with an
    event_id secondary (two stable argsorts — equal-(user,ts) rows end
    up event_id-ascending, matching the oracle's ``ORDER BY ts,
    event_id``). The window sum is built oldest-lag-first from shifted
    views masked at user boundaries — a fixed number of vectorized adds,
    no prefix-sum float drift and no per-row loop; a 100 TB events table
    only ever moves through the user-keyed exchange once.
    """
    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = {
            "event_id": "int64", "user_id": "int64", "ts": "datetime64[us]",
            "roll_n": "int64", "roll_sum": "float64", "roll_mean": "float64",
        }
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in out_cols.items()})
        u = df["user_id"].to_numpy(np.int64)
        ts = _ts_us(df["ts"])
        eid = df["event_id"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        uniq, shift, base = _key_layout(u, u[:0], ts)
        pk = _pack(u, ts - base, uniq, shift)
        sec = np.argsort(eid, kind="stable")
        order = sec[np.argsort(pk[sec], kind="stable")]
        u, ts, eid, v = u[order], ts[order], eid[order], v[order]
        n = len(u)
        # rows since the user's first row (0-based position within user)
        new_user = np.empty(n, bool)
        new_user[0] = True
        np.not_equal(u[1:], u[:-1], out=new_user[1:])
        idx = np.arange(n, dtype=np.int64)
        user_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        pos = idx - user_start
        # oldest lag first: matches left-to-right accumulation order of
        # the oracle's window sum (3-element float error << rint scale)
        s = np.zeros(n, np.float64)
        cnt = np.ones(n, np.int64)
        for lag in range(ROLL_PRECEDING, 0, -1):
            take = pos >= lag  # lagged row exists and is the same user
            np.add(s, np.where(take, np.concatenate(
                [np.zeros(lag), v[:-lag]]), 0.0), out=s)
            cnt += take
        s += v
        # half-UP rounding (floor(x*100+0.5)), NOT the usual rint recipe:
        # 2-decimal inputs make mean-of-2 land EXACTLY on .005 boundaries
        # where rint (half-to-even) and DuckDB round (half-away) disagree;
        # floor(x*100+0.5) is bit-identical across both engines
        scale = 100.0
        return pd.DataFrame({
            "event_id": eid, "user_id": u, "ts": _us_series(ts),
            "roll_n": cnt,
            "roll_sum": np.floor(s * scale + 0.5) / scale,
            "roll_mean": np.floor(s / cnt * scale + 0.5) / scale,
        })

    return bucketed_group_map(
        _read_events(sf_dir), key="user_id", fn=per_bucket, num_buckets=None
    )


# ------------------------------------------------------- per-user value rank
def event_rank(sf_dir: str):
    """Analytic ranking window (row_number + dense_rank): each event's
    rank of ``value`` (descending) within its user's history.

    row_number breaks value ties by event_id ascending (fully
    deterministic on both sides); dense_rank depends only on exact float
    comparisons — no float arithmetic, so no rounding recipe is needed.
    Kernel: three stable argsorts (event_id, then value descending, then
    user) give (user asc, value desc, event_id asc) order; ranks are
    boundary cumsums — no per-group Python.
    """
    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = {
            "event_id": "int64", "user_id": "int64",
            "value_row_number": "int64", "value_dense_rank": "int64",
        }
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in out_cols.items()})
        u = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        order = np.argsort(eid, kind="stable")
        order = order[np.argsort(-v[order], kind="stable")]
        order = order[np.argsort(u[order], kind="stable")]
        u, eid, v = u[order], eid[order], v[order]
        n = len(u)
        new_user = np.empty(n, bool)
        new_user[0] = True
        np.not_equal(u[1:], u[:-1], out=new_user[1:])
        idx = np.arange(n, dtype=np.int64)
        user_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        rownum = idx - user_start + 1
        new_val = new_user.copy()
        new_val[1:] |= v[1:] != v[:-1]
        gid = np.cumsum(new_val)  # bucket-global dense group label
        gid_at_start = np.maximum.accumulate(np.where(new_user, gid, 0))
        dense = gid - gid_at_start + 1
        return pd.DataFrame({
            "event_id": eid, "user_id": u,
            "value_row_number": rownum.astype(np.int64),
            "value_dense_rank": dense.astype(np.int64),
        })

    return bucketed_group_map(
        _read_events(sf_dir), key="user_id", fn=per_bucket, num_buckets=None
    )


# -------------------------------------------------------- session windows
def sessionize(sf_dir: str):
    """Session-window aggregate (the streaming window op; beyond the
    reference): per-user event runs split where the gap to the previous
    event exceeds 6h; one output row per session with start/end/count/sum.

    Per bucket: one packed-key sort puts every user's events in time
    order; session breaks are a vectorized diff; the per-user session
    ordinal is ``cumsum(break) - cumsum_at_user_start + 1`` computed with
    ``np.maximum.accumulate`` (no per-user loop). Aggregation is
    ``np.add.reduceat`` over break boundaries.
    """
    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "session_seq": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="datetime64[us]"),
                "session_end": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype="int64"),
                "sum_value": pd.Series(dtype="float64"),
            })
        u = df["user_id"].to_numpy(np.int64)
        ts = _ts_us(df["ts"])
        v = df["value"].to_numpy(np.float64)
        uniq, shift, base = _key_layout(u, u[:0], ts)
        order = np.argsort(_pack(u, ts - base, uniq, shift), kind="stable")
        u, ts, v = u[order], ts[order], v[order]
        new_user = np.empty(len(u), bool)
        new_user[0] = True
        np.not_equal(u[1:], u[:-1], out=new_user[1:])
        brk = new_user.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > SESSION_GAP_US
        sess = np.cumsum(brk)  # bucket-global session label, 1-based
        # per-user ordinal: sess minus the sess value at the user's first
        # row; sess is nondecreasing so a running max over (sess at user
        # starts, else 0) carries each user's base forward
        at_start = np.where(new_user, sess, 0)
        seq = sess - np.maximum.accumulate(at_start) + 1
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(u))
        sums = np.add.reduceat(v, starts)
        scale = 100.0
        return pd.DataFrame({
            "user_id": u[starts],
            "session_seq": seq[starts].astype(np.int64),
            "session_start": _us_series(ts[starts]),
            "session_end": _us_series(ts[ends - 1]),
            "n_events": (ends - starts).astype(np.int64),
            "sum_value": np.rint(sums * scale) / scale,
        })

    return bucketed_group_map(
        _read_events(sf_dir), key="user_id", fn=per_bucket, num_buckets=None
    )


def session_funnel(sf_dir: str):
    """Per-session conversion funnel: within each user session (the same
    6-hour-gap windows as :func:`sessionize`) the deepest ORDERED stage
    reached — 1 = a 'view', 2 = a 'click' strictly after that view,
    3 = a 'purchase' strictly after that click (earliest-qualifying
    timestamps, so the result depends only on event times, never on row
    order), 0 = session with no view. The product-analytics pass run
    per release over the event log.

    Per bucket (co-partitioned by user, same packed-key sort and break
    detection as sessionize): stage timestamps are three masked
    ``np.minimum.reduceat`` passes over the session segments — v = min
    view ts, c = min click ts > v, p = min purchase ts > c — no
    per-session Python. Oracle: the sessionize CTE + three nested
    min-filter aggregates; integer stages, no float in the comparison."""
    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "session_seq": pd.Series(dtype="int64"),
                "stage": pd.Series(dtype="int64"),
            })
        u = df["user_id"].to_numpy(np.int64)
        ts = _ts_us(df["ts"])
        et = df["event_type"].to_numpy()
        uniq, shift, base = _key_layout(u, u[:0], ts)
        order = np.argsort(_pack(u, ts - base, uniq, shift), kind="stable")
        u, ts, et = u[order], ts[order], et[order]
        new_user = np.empty(len(u), bool)
        new_user[0] = True
        np.not_equal(u[1:], u[:-1], out=new_user[1:])
        brk = new_user.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > SESSION_GAP_US
        sess = np.cumsum(brk)
        at_start = np.where(new_user, sess, 0)
        seq = sess - np.maximum.accumulate(at_start) + 1
        starts = np.flatnonzero(brk)
        seg_len = np.diff(np.append(starts, len(u)))

        INF = np.iinfo(np.int64).max

        def seg_min(mask: np.ndarray) -> np.ndarray:
            vals = np.where(mask, ts, INF)
            return np.minimum.reduceat(vals, starts)

        v = seg_min(et == "view")
        c = seg_min((et == "click") & (ts > np.repeat(v, seg_len)))
        p = seg_min((et == "purchase") & (ts > np.repeat(c, seg_len)))
        stage = ((v < INF).astype(np.int64) + (c < INF) + (p < INF))
        return pd.DataFrame({
            "user_id": u[starts],
            "session_seq": seq[starts].astype(np.int64),
            "stage": stage,
        })

    return bucketed_group_map(
        _read_events(sf_dir), key="user_id", fn=per_bucket, num_buckets=None
    )


def event_gaps(sf_dir: str):
    """Per-user LAG window: for every event, the gap (µs, exact int64) to
    the user's previous event ordered by ``(ts, event_id)``; a user's
    first event reports -1 (no NULL crosses the oracle compare).

    Same single user-keyed exchange + packed-key sort as ``rolling_agg``;
    the gap is one shifted subtraction masked at user boundaries."""
    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"event_id": "int64", "user_id": "int64",
                    "gap_us": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in out_cols.items()})
        u = df["user_id"].to_numpy(np.int64)
        ts = _ts_us(df["ts"])
        eid = df["event_id"].to_numpy(np.int64)
        uniq, shift, base = _key_layout(u, u[:0], ts)
        pk = _pack(u, ts - base, uniq, shift)
        sec = np.argsort(eid, kind="stable")
        order = sec[np.argsort(pk[sec], kind="stable")]
        u, ts, eid = u[order], ts[order], eid[order]
        gap = np.empty(len(u), np.int64)
        gap[0] = -1
        np.subtract(ts[1:], ts[:-1], out=gap[1:])
        gap[1:][u[1:] != u[:-1]] = -1
        return pd.DataFrame({"event_id": eid, "user_id": u, "gap_us": gap})

    import ray.data as rd

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts"])
    return bucketed_group_map(ev, key="user_id", fn=per_bucket,
                              num_buckets=None)
