"""Oracle-checked relational operators over the driver testdata tables.

One function per SURVEY.md §2 operator family, each taking ``sf_dir`` and
returning a ``ray.data.Dataset`` whose schema/column names match the
DuckDB oracle SQL in ``__ray_entry__.oracle_sql`` exactly.

Scale discipline (applies to every function here):
  * reads prune columns at the source (``read_parquet(columns=[...])``);
  * per-batch work is vectorized Arrow/numpy;
  * small sides are broadcast (``ray.put`` + ``pc.is_in``), never shuffled;
  * aggregates pre-combine per batch before the ``groupby`` shuffle where
    the key count is bounded.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import bucketed_group_map


def _rp(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _round_cols(ds, cols: tuple[str, ...], ndigits: int = 2):
    """Round float columns post-aggregate to BITWISE-identical doubles on
    both sides: float sums accumulate in a different order here vs DuckDB
    (one-ulp differences), and ``pc.round``/DuckDB ``round`` may then round
    to different neighbouring doubles. Recipe used on BOTH sides instead:
    ``rint(x * 10^d) / 10^d`` — the scaled value is an exact integer double
    and a single IEEE division yields identical bits everywhere. Oracle SQL
    mirrors this as ``round(x * 10^d) / 10^d``."""
    scale = float(10 ** ndigits)

    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            v = np.rint(np.asarray(t[c], dtype=np.float64) * scale) / scale
            t = t.set_column(
                t.schema.get_field_index(c), c, pa.array(v, pa.float64())
            )
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------- M2/M4/M10
def filter_project(sf_dir: str):
    """Vectorized predicate filter + projection (reference M2/M4: isin
    filters, build_ali_corpus.py:23-25, build_ali_dataset.py:352-353)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(t["lang"], value_set=pa.array(["en", "de"])),
            pc.greater(t["n_chars"], 120),
        )
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------- A2/A3
def groupby_count(sf_dir: str):
    """Group sizes + sums (reference A2 value_counts,
    build_ali_dataset.py:355-356). Partial+final: each batch collapses to
    ≤5 event-type rows before the (value-sorting) Aggregate."""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow partial (VERDICT r3 #7): no pandas round-trip
        g = t.group_by("event_type").aggregate(
            [([], "count_all"), ("value", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "n": g["count_all"],
                         "sum_value": g["value_sum"]})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = parts.groupby("event_type").aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
    )
    return _round_cols(agg, ("sum_value",))


def distinct_values(sf_dir: str):
    """Distinct (reference A3 unique/nunique, build_ali_dataset.py:74,147)."""
    import ray.data as rd

    ds = _rp(sf_dir, "documents", columns=["lang"])
    vals = sorted(ds.unique("lang"))
    return rd.from_arrow(pa.table({"lang": pa.array(vals, pa.string())}))


# ----------------------------------------------------------------------- M5
def group_size_filter(sf_dir: str):
    """Keep groups with >= 10 members (reference M5: drop clusters with <10
    records, build_ali_dataset.py:355-358). Partial per-batch counts →
    small groupby → filter, no raw-row shuffle."""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(np.asarray(t["user_id"]), return_counts=True)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.groupby("user_id").aggregate(Sum("n", alias_name="n"))
    return agg.filter(expr="n >= 10")


# ------------------------------------------------------------------- J4/J3
SEMI_BROADCAST_THRESHOLD = 4_000_000  # build-side ROWS (≥ distinct keys);
# below: gather the distinct key set once and filter map-side (no shuffle);
# above: bucketed semi/anti — only the key column shuffles and the driver
# never materializes keys (VERDICT r3 #2 hybrid rule, same shape as
# er.ATTACH_BROADCAST_THRESHOLD).


def _semi_anti(left, right_keys, *, on: str, right_on: str, anti: bool,
               broadcast_threshold: int = SEMI_BROADCAST_THRESHOLD):
    """Hybrid semi/anti join: broadcast key set below the threshold,
    bucketed exchange above (build-side row count is the cheap,
    conservative proxy for distinct-key count)."""
    import ray

    from ..util import bucketed_semi_join

    right_keys = right_keys.materialize()
    if right_keys.count() > broadcast_threshold:
        return bucketed_semi_join(left, right_keys, on=on, right_on=right_on,
                                  anti=anti)
    keys = set(right_keys.unique(right_on))
    ref = ray.put(np.fromiter(keys, np.int64))

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[on], value_set=pa.array(ray.get(ref)))
        return t.filter(pc.invert(mask) if anti else mask)

    return left.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def semi_join(sf_dir: str, broadcast_threshold: int = SEMI_BROADCAST_THRESHOLD):
    """Hybrid semi join (reference J4 `isin` semi joins): customers having
    at least one order."""
    return _semi_anti(
        _rp(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        _rp(sf_dir, "orders", columns=["o_custkey"]),
        on="c_custkey", right_on="o_custkey", anti=False,
        broadcast_threshold=broadcast_threshold,
    )


def anti_join(sf_dir: str, broadcast_threshold: int = SEMI_BROADCAST_THRESHOLD):
    """Hybrid anti join (reference J3 left-anti via merge indicator,
    build_ali_dataset.py:88-97): customers with no 'F'-status orders
    (predicate chosen so the result is non-empty at every sf)."""
    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    f_orders = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _semi_anti(
        _rp(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        f_orders,
        on="c_custkey", right_on="o_custkey", anti=True,
        broadcast_threshold=broadcast_threshold,
    )


# -------------------------------------------------------------- large join
def join_agg(sf_dir: str):
    """Hash-partitioned large join + aggregate (reference J1/J2 rephrased on
    TPC-H-ish tables): orders ⋈ customer → per-mktsegment counts.

    The join runs over the RAW orders rows (the operator under test is
    the distributed join, not an aggregate pushdown) through the raw-task
    hash exchange (`bucketed_join`) — Ray 2.49's native `Dataset.join`
    (still available as `util.hash_join`) measures ~2× slower here."""
    from ray.data.aggregate import Sum

    from ..util import bucketed_join

    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = bucketed_join(
        cust,
        orders,
        on="c_custkey",
        right_on="o_custkey",
        num_buckets=16,
    )

    # partial+final: each joined batch collapses to ≤5 segment rows, so
    # the (value-sorting) final Aggregate sees 5×n_blocks rows, not the
    # full joined table
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("c_mktsegment").aggregate(
            [([], "count_all"), ("o_totalprice", "sum")])
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "n_orders": g["count_all"],
                         "sum_price": g["o_totalprice_sum"]})

    parts = joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = parts.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("sum_price", alias_name="sum_price"),
    )
    return _round_cols(agg, ("sum_price",))


# ----------------------------------------------------------------------- O3
def topk(sf_dir: str):
    """Global top-k by sort+limit (reference O3: top-12 similar clusters,
    build_ali_dataset.py:160-169). Deterministic tie-break on full key."""
    ds = _rp(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    return ds.sort(
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        descending=[True, False, False],
    ).limit(15)


# ------------------------------------------------------------------- U1/U2
def union_dedup(sf_dir: str):
    """Union of two overlapping slices + exact dedup (reference U1 concat +
    U2 pair dedup): canonical key ordering + hash-partition + per-group
    first — no global in-memory set."""
    docs = _rp(sf_dir, "documents", columns=["doc_id", "lang"])
    lo = docs.filter(expr="doc_id < 300")
    hi = docs.filter(expr="doc_id >= 200")
    both = lo.union(hi)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("doc_id")

    return bucketed_group_map(both, key="doc_id", fn=dedup, num_buckets=8)


# ------------------------------------------------------------------ A1 (!)
def assembly(sf_dir: str):
    """The conversation-assembly analog on driver data: events grouped by
    user_id, event_type concatenated in (ts, event_id) order (reference A1
    group-union aggregate + the north-star stable-ordering groupby)."""
    ds = _rp(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        return pd.DataFrame(
            {
                "user_id": g.size().index.to_numpy(),
                "n_events": g.size().to_numpy().astype("int64"),
                "event_seq": g["event_type"].agg("|".join).to_numpy(),
            }
        )

    return bucketed_group_map(ds, key="user_id", fn=fn, num_buckets=16)


# ---------------------------------------------------- A4-style partial agg
def pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with per-batch pre-aggregation
    (the partial+final pattern of the reference's metric accumulation, A4
    matcher.py:14-24)."""
    from ray.data.aggregate import Sum

    ds = _rp(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = t.append_column("disc_price", disc).group_by(
            ["l_returnflag", "l_linestatus"]
        ).aggregate([("l_quantity", "sum"), ("l_extendedprice", "sum"),
                     ("disc_price", "sum"), ([], "count_all")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["l_quantity_sum"],
            "sum_base_price": g["l_extendedprice_sum"],
            "sum_disc_price": g["disc_price_sum"],
            "n": g["count_all"],
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        parts.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("n", alias_name="n"),
        )
    )
    return _round_cols(agg, ("sum_qty", "sum_base_price", "sum_disc_price"))


# ------------------------------------------------------------------- M7/F4
def concat_cols(sf_dir: str):
    """Null-coalescing multi-column concat (reference M7,
    alidatamodule.py:128-134)."""
    from ..functions.text import concat_coalesce

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def fn(t: pa.Table) -> pa.Table:
        comb = concat_coalesce([t["lang"], t["source"]])
        return pa.table({"doc_id": t["doc_id"], "combined": comb})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------- O1/O2
def group_topk(sf_dir: str):
    """Per-group sort + head-k (reference O1/O2: per-cluster hardest-half
    selection, build_ali_dataset.py:102-110,188-197): top-2 events by value
    per user. Per-group top-k inside a bucketed group map — no global sort."""
    ds = _rp(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("user_id", sort=False).head(2)

    out = bucketed_group_map(ds, key="user_id", fn=fn, num_buckets=16)
    return _round_cols(out, ("value",), ndigits=6)


# ----------------------------------------------------------------------- O5
def deterministic_split(sf_dir: str):
    """Content-derived (never RNG-state) split (reference O5
    train_test_split, build_ali_dataset.py:263-296 — made deterministic per
    SURVEY §4): 'train' = doc_id mod 10 < 7. Pure vectorized filter."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang"])

    def filt(t: pa.Table) -> pa.Table:
        mod = pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 10), 10)
        )
        return t.filter(pc.less(mod, 7))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------- M6/F3
def regex_clean(sf_dir: str):
    """Vectorized regex normalization (reference M6/F3: pv_pairs
    '#;#'/'#:#' flattening, alidatamodule.py:119-126, dm.py:244-245):
    digit runs → '#'. RE2 semantics on both sides (pc.replace_substring_regex
    / DuckDB regexp_replace)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        cleaned = pc.replace_substring_regex(t["text"], pattern="[0-9]+",
                                             replacement="#")
        return pa.table({"doc_id": t["doc_id"], "cleaned": cleaned})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------------------- A5
def overlap_stats(sf_dir: str):
    """Overlap-ratio statistic (reference A5: fraction of test ids seen in
    train, stat_wdc.py:17-63): distinct event users ∩ customer keys.

    Scale shape (r1 VERDICT fix — the old version pulled every distinct
    user_id to the driver as a python set): broadcast the SMALL side
    (customer keys, zero-copy Arrow index) once; the big side pre-dedups
    per batch, hash-partitions on user_id, and each bucket emits one
    (n_users, n_overlap) partial — the driver sums a handful of rows.
    At 100 TB the distinct-user set never materializes in one place."""
    import pandas as pd
    import ray

    from ..util import (broadcast_lookup, bucketed_group_map,
                        build_broadcast_index, dataset_to_arrow)

    cust = dataset_to_arrow(
        _rp(sf_dir, "customer", columns=["c_custkey"]).materialize())
    cref = ray.put(build_broadcast_index(cust, "c_custkey", ["c_custkey"]))

    users = _rp(sf_dir, "events", columns=["user_id"])
    pre = users.map_batches(  # per-batch combiner: unique before shuffle
        lambda t: pa.table({"user_id": pc.unique(
            t["user_id"].combine_chunks() if isinstance(t["user_id"], pa.ChunkedArray) else t["user_id"])}),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = pa.array(df["user_id"].unique())
        hit = broadcast_lookup(ray.get(cref), u, "c_custkey")
        return pd.DataFrame(
            {"n_users": [len(u)], "n_overlap": [len(u) - hit.null_count]}
        )

    parts = bucketed_group_map(pre, key="user_id", fn=per_bucket,
                               num_buckets=8).to_pandas()
    return pa.table(
        {
            "n_users": pa.array([int(parts["n_users"].sum())], pa.int64()),
            "n_overlap": pa.array([int(parts["n_overlap"].sum())], pa.int64()),
        }
    )


# -------------------------------------------------------- windowed aggregate
def window_agg(sf_dir: str):
    """Tumbling-window aggregate (beyond the reference — the streaming-shaped
    op a training-data pipeline needs; SURVEY §2.10 notes the reference has
    none): events bucketed into 1-hour windows, count + sum per
    (window_start, event_type). Window assignment is a stateless vectorized
    timestamp floor per batch with per-batch pre-aggregation, so the shuffle
    carries only (window, type) partials — the partial+final pattern."""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        g = pa.table({
            "window_start": win, "event_type": t["event_type"],
            "value": t["value"],
        }).group_by(["window_start", "event_type"]).aggregate(
            [([], "count_all"), ("value", "sum")])
        return pa.table({
            "window_start": g["window_start"],
            "event_type": g["event_type"],
            "n": g["count_all"],
            "sum_value": g["value_sum"],
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.groupby(["window_start", "event_type"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
    )

    def cast_us(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("window_start")
        return t.set_column(
            i, "window_start", pc.cast(t["window_start"], pa.timestamp("us"))
        )

    agg = agg.map_batches(cast_us, batch_format="pyarrow", zero_copy_batch=True)
    return _round_cols(agg, ("sum_value",))


def sliding_window_agg(sf_dir: str, window_min: int = 60,
                       slide_min: int = 15):
    """Sliding (hopping) event-time window aggregate — the overlapping-
    window companion to :func:`window_agg` (tumbling): 1-hour windows
    every 15 minutes, count + sum per (window_start, event_type); each
    event lands in ``window_min/slide_min`` = 4 overlapping windows.

    Scale shape: stateless vectorized window EXPLOSION per batch (the hop
    count is a small constant — one integer-microsecond broadcast
    subtraction, one ``take`` per payload column) followed by per-batch
    pre-aggregation, so the single shuffle carries only (window, type)
    partials — the explosion factor never reaches the exchange. Oracle:
    the ``time_bucket - j·slide`` unnest CTE; window starts computed in
    integer microseconds on both engines."""
    from ray.data.aggregate import Sum

    assert window_min % slide_min == 0
    hops = window_min // slide_min
    slide_us = slide_min * 60_000_000
    ds = _rp(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "window_start": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            })
        us = np.asarray(pc.cast(t["ts"], pa.int64()), np.int64)
        base = (us // slide_us) * slide_us
        j = np.arange(hops, dtype=np.int64) * slide_us
        starts = (base[:, None] - j[None, :]).ravel()  # row-major
        idx = pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64),
                                 hops))
        g = pa.table({
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            "event_type": t["event_type"].take(idx),
            "value": t["value"].take(idx),
        }).group_by(["window_start", "event_type"]).aggregate(
            [([], "count_all"), ("value", "sum")])
        return pa.table({
            "window_start": g["window_start"],
            "event_type": g["event_type"],
            "n": g["count_all"],
            "sum_value": g["value_sum"],
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096)
    agg = parts.groupby(["window_start", "event_type"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))

    def cast_us(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("window_start")
        return t.set_column(
            i, "window_start", pc.cast(t["window_start"], pa.timestamp("us")))

    agg = agg.map_batches(cast_us, batch_format="pyarrow",
                          zero_copy_batch=True)
    return _round_cols(agg, ("sum_value",))


# ---------------------------------------------------------------- J5 variant
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_counts(sf_dir: str):
    """Pivot / conditional aggregation (wide one-hot counts — the feature
    layout a per-entity training table needs): one row per user_id with a
    count column per event type. Scale shape: each batch pre-pivots to the
    fixed five int columns, so the shuffle carries (user, 5×int64) partials
    and the final groupby sums them — never a wide string column through
    the exchange. Oracle: count(*) FILTER (WHERE event_type=...) per type."""
    from ..util import bucketed_group_map

    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        # numpy pre-pivot (VERDICT r3 #7): pack (user, type-code) into one
        # int64 key, count with one np.unique, scatter to the 5 columns
        import numpy as np

        types = pa.array(EVENT_TYPES, pa.string())
        code = pc.index_in(t["event_type"], value_set=types)
        codes = np.asarray(code.combine_chunks()
                           if isinstance(code, pa.ChunkedArray) else code,
                           np.int64)
        users = np.asarray(t["user_id"], np.int64)
        k = len(EVENT_TYPES)
        keys, cnt = np.unique(users * k + codes, return_counts=True)
        u, c = keys // k, keys % k
        uu, inv = np.unique(u, return_inverse=True)
        mat = np.zeros((len(uu), k), np.int64)
        mat[inv, c] = cnt
        out = {"user_id": pa.array(uu, pa.int64())}
        for j, name in enumerate(EVENT_TYPES):
            out[name] = pa.array(mat[:, j], pa.int64())
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # final combine via the raw-task hash exchange, NOT Dataset.groupby:
    # Ray 2.49's sort shuffle value-sorts the partials (measured 4s wall /
    # 23 core-s for a 62k-row partial table at sf0.1)
    cols = list(EVENT_TYPES)

    def fin(df):
        return df.groupby("user_id", sort=False, as_index=False)[cols].sum()

    return bucketed_group_map(parts, "user_id", fin, num_buckets=None)


# -------------------------------------------------------------- left join
def left_join_counts(sf_dir: str):
    """LEFT OUTER hash join (the join type the inner-join suite doesn't
    exercise): every customer row survives, with its event count or 0 —
    at this sf ~90% of customers have no events, so the null path is
    genuinely covered. Build side is the pre-aggregated per-user count
    (partial+final), probe side streams through one bucketed exchange."""
    from ..util import bucketed_group_map, bucketed_join

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    ev = _rp(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        u, cnt = np.unique(np.asarray(t["user_id"]), return_counts=True)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "n_events": pa.array(cnt, pa.int64())})

    parts = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def fin(df):
        return df.groupby("user_id", sort=False, as_index=False)[
            ["n_events"]].sum()

    counts = bucketed_group_map(parts, "user_id", fin, num_buckets=None)
    joined = bucketed_join(
        cust, counts, on="c_custkey", right_on="user_id",
        how="left_outer", num_buckets=16,
    )

    def fill0(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("n_events")
        return t.set_column(
            i, "n_events",
            pc.fill_null(pc.cast(t["n_events"], pa.int64()), 0))

    return joined.map_batches(fill0, batch_format="pyarrow",
                              zero_copy_batch=True)


# ------------------------------------------------------------------ J1 rows
def join_rows(sf_dir: str):
    """Row-level distributed inner join (the J1/J2 family at row
    granularity — ``join_agg`` exercises join+aggregate; this emits the
    JOINED ROWS themselves, the shape a pipeline uses to attach order
    context to line items before further per-row transforms).

    Filter pushes down before the exchange (only ~4% of lineitem rows
    survive ``l_quantity >= 49``), so the shuffle moves the small side's
    bytes, not the full fact table. Raw payload doubles pass through
    untouched — exact parity with the parquet values, no rounding."""
    from ..util import bucketed_join

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_quantity",
                      "l_extendedprice"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["l_quantity"], 49.0))

    li = li.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    ords = _rp(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderpriority"])
    return bucketed_join(ords, li, on="o_orderkey", right_on="l_orderkey",
                         num_buckets=16)


# ------------------------------------------------------------- J full outer
def full_join_counts(sf_dir: str):
    """FULL OUTER hash join — the one join type the inner/left suite
    doesn't exercise. Per-customer URGENT-order counts ⋈ per-user
    purchase-event counts (the synth corpus gives EVERY customer an
    order, so the unfiltered pairing would degenerate to a left join;
    the filters leave real unmatched rows on BOTH sides at every sf).
    Both inputs pre-aggregate (partial per batch, final per bucket)
    before the join, so the exchange moves one row per key."""
    from ..util import bucketed_group_map, bucketed_join

    ords = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    ev = _rp(sf_dir, "events", columns=["user_id", "event_type"])

    def part(col: str, out: str, flt: str, val: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t[flt], val))
            u, c = np.unique(np.asarray(t[col]), return_counts=True)
            return pa.table({"custkey": pa.array(u, pa.int64()),
                             out: pa.array(c, pa.int64())})

        return fn

    def fin(col: str):
        def fn(df):
            return df.groupby("custkey", sort=False, as_index=False)[
                [col]].sum()

        return fn

    oc = bucketed_group_map(
        ords.map_batches(
            part("o_custkey", "n_orders", "o_orderpriority", "1-URGENT"),
            batch_format="pyarrow", zero_copy_batch=True),
        "custkey", fin("n_orders"), num_buckets=None)
    ec = bucketed_group_map(
        ev.map_batches(
            part("user_id", "n_events", "event_type", "purchase"),
            batch_format="pyarrow", zero_copy_batch=True),
        "custkey", fin("n_events"), num_buckets=None)
    joined = bucketed_join(oc, ec, on="custkey", how="full_outer",
                           num_buckets=16)

    def fill0(t: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": t["custkey"],
            "n_orders": pc.fill_null(pc.cast(t["n_orders"], pa.int64()), 0),
            "n_events": pc.fill_null(pc.cast(t["n_events"], pa.int64()), 0),
        })

    return joined.map_batches(fill0, batch_format="pyarrow",
                              zero_copy_batch=True)


# -------------------------------------------------------------- A rollup
def rollup_agg(sf_dir: str):
    """Grouping-sets / ROLLUP aggregate: event counts at (event_type, dow),
    (event_type) and () levels in one pass — the OLAP summary shape the
    single-level groupby suite doesn't cover. Rolled-up keys are encoded
    ('ALL', -1) so no NULL crosses the oracle comparison.

    Scale shape: each batch pre-collapses to ≤ n_types×7 rows, the driver
    final combines a bounded partial table (35 keys regardless of input
    size) and derives the upper levels from the finest level — integer
    sums, so upper levels are exact and no second pass over the data is
    needed. dow parity: ``(epoch_us // 86_400_000_000 + 4) % 7`` on both
    sides (0=Sunday), expression-identical to the DuckDB oracle."""
    ev = _rp(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = np.asarray(t["ts"], dtype="datetime64[us]").astype(np.int64)
        dow = (us // 86_400_000_000 + 4) % 7
        g = pa.table({
            "event_type": t["event_type"],
            "dow": pa.array(dow, pa.int64()),
        }).group_by(["event_type", "dow"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"], "dow": g["dow"],
                         "n_events": g["count_all"]})

    parts = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=8192)
    # final combine through ONE type-keyed exchange (the driver sees the
    # ≤ n_types×7 final rows, never the per-block partial stream)
    def _fin(df):
        return df.groupby(["event_type", "dow"], sort=False,
                          as_index=False)["n_events"].sum()

    base = bucketed_group_map(parts, "event_type", _fin,
                              num_buckets=None).to_pandas()
    lvl1 = (base.groupby("event_type", sort=False, as_index=False)
            ["n_events"].sum())
    lvl1["dow"] = np.int64(-1)
    total = pd.DataFrame({"event_type": ["ALL"], "dow": np.int64(-1),
                          "n_events": [base["n_events"].sum()]})
    out = pd.concat([base, lvl1[["event_type", "dow", "n_events"]], total],
                    ignore_index=True)
    out["dow"] = out["dow"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return pa.Table.from_pandas(out[["event_type", "dow", "n_events"]],
                                preserve_index=False)


# ------------------------------------------------------------ M6 json attr
def json_extract_agg(sf_dir: str):
    """Semi-structured attribute extraction + aggregate (the M6 attr-map
    family over a JSON column): parse ``events.props`` ('{"k": N}'),
    extract the integer attribute, aggregate per event type.

    Extraction is one vectorized RE2 pass (``pc.extract_regex``) — the
    pyarrow<->DuckDB RE2 parity recipe (see pii_scrub): the SAME pattern
    runs as ``regexp_extract`` in the oracle, and all outputs are exact
    integers, so nothing float crosses the compare. Partial aggregates
    collapse each batch to ≤ n_types rows before the tiny final."""
    ev = _rp(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        k = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>\d+)')
        kv = pc.cast(pc.struct_field(k, "k"), pa.int64())
        g = pa.table({"event_type": t["event_type"], "k": kv}).group_by(
            "event_type").aggregate(
                [("k", "sum"), ("k", "min"), ("k", "max"),
                 ([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "sum_k": g["k_sum"], "min_k": g["k_min"],
                         "max_k": g["k_max"], "n": g["count_all"]})

    parts = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=8192)
    # final combine through ONE type-keyed exchange; the driver sees
    # only the ≤ n_types final rows
    def _fin(df):
        return df.groupby("event_type", sort=False, as_index=False).agg(
            sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
            max_k=("max_k", "max"), n=("n", "sum"))

    out = (bucketed_group_map(parts, "event_type", _fin, num_buckets=None)
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    for c in ("sum_k", "min_k", "max_k", "n"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --------------------------------------------------------------- O1 argmax
def latest_order(sf_dir: str):
    """Per-group argmax (the 'latest row per key' pattern): each
    customer's most recent order, ties on o_orderdate broken by the
    larger o_orderkey — deterministic on both engines.

    Per batch: one lexsort + take-last-per-key collapses the batch to
    ≤ n_batch_custs rows; the bucketed exchange then repeats the same
    reduce per key bucket, so no task ever sees a customer's full order
    history materialized beyond its own bucket. Deliberately NOT the
    packed-uint64 single-key sort from temporal.py: date-us needs ~51
    bits and o_orderkey is unbounded (TPC-H sf1000 keys exceed 2^40), so
    (date << k) | key cannot pack losslessly; the numeric 3-key lexsort
    is the correct general form here."""
    from ..util import bucketed_group_map

    ords = _rp(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def argmax_np(cust, key, date):
        order = np.lexsort((key, date, cust))
        cust_s = cust[order]
        last = np.nonzero(np.append(cust_s[1:] != cust_s[:-1], True))[0]
        sel = order[last]
        return sel

    def partial(t: pa.Table) -> pa.Table:
        cust = np.asarray(t["o_custkey"])
        key = np.asarray(t["o_orderkey"])
        date = np.asarray(t["o_orderdate"], dtype="datetime64[us]").astype(
            np.int64)
        sel = argmax_np(cust, key, date)
        return t.take(pa.array(sel))

    parts = ords.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=8192)

    def fin(df):
        cust = df["o_custkey"].to_numpy()
        key = df["o_orderkey"].to_numpy()
        date = df["o_orderdate"].to_numpy().astype("datetime64[us]").astype(
            np.int64)
        sel = argmax_np(cust, key, date)
        return df.iloc[sel]

    return bucketed_group_map(parts, "o_custkey", fin, num_buckets=None)


# ------------------------------------------------------------- O2 ntile
def value_quartiles(sf_dir: str):
    """NTILE(4) quartile assignment per event type ordered by (value,
    event_id) — the bucketed-rank window family (event_rank covers
    row_number; this covers equal-height binning). Integer output, raw
    doubles only ORDERED (never operated on), so parity is exact.

    Partitioning assumption (documented, same as group_quantiles): the
    partition key is low-cardinality (n_types); each exchange bucket
    sorts only its own types' rows. NTILE arithmetic mirrors DuckDB:
    n//4 per bucket with the first n%4 buckets one larger."""
    from ..util import bucketed_group_map

    ev = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def fin(df):
        # factorize the string key first: numeric-codes lexsort beats a
        # string-key lexsort by ~an order of magnitude (codes only need
        # to GROUP equal types, not order them — NTILE is per-partition)
        typ_codes, _ = pd.factorize(df["event_type"], sort=False)
        val = df["value"].to_numpy()
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, val, typ_codes))
        typ_s = typ_codes[order]
        starts = np.nonzero(np.append(True, typ_s[1:] != typ_s[:-1]))[0]
        ends = np.append(starts[1:], len(typ_s))
        q = np.empty(len(typ_s), np.int64)
        for s, e in zip(starts, ends):  # one iteration per TYPE (bounded)
            n = e - s
            size, extra = divmod(n, 4)
            pos = np.arange(n)
            cut = extra * (size + 1)
            # first `extra` buckets hold size+1 rows, the rest `size`
            # (max(size,1) only guards the eager np.where branch when
            # n < 4 — then pos < cut for every row and it's never used)
            q[s:e] = np.where(
                pos < cut,
                pos // (size + 1),
                extra + (pos - cut) // max(size, 1),
            ) + 1
        out = df.iloc[order][["event_id", "event_type"]].copy()
        out["quartile"] = q
        return out

    return bucketed_group_map(ev, "event_type", fin, num_buckets=None)


# ------------------------------------------------------- groupwise filter
def above_median_orders(sf_dir: str):
    """Correlated-subquery pattern: orders strictly above their own
    customer's median order price. One user-keyed exchange; per bucket a
    vectorized groupby-median then a filter against the raw values.

    Float parity: the median of an even group is (a+b)/2 of the SAME two
    doubles in both engines (numpy and DuckDB both interpolate midpoint),
    one IEEE add + one divide → bitwise identical, and the comparison
    operand is the untouched raw double — nothing accumulates."""
    from ..util import bucketed_group_map

    ords = _rp(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def fin(df):
        med = df.groupby("o_custkey")["o_totalprice"].transform("median")
        return df[df["o_totalprice"] > med]

    return bucketed_group_map(ords, "o_custkey", fin, num_buckets=None)


# ------------------------------------------------------- stats aggregate
def corr_by_type(sf_dir: str):
    """Per-group Pearson correlation (the covariance/correlation aggregate
    family): corr(value, props.k) per event type.

    Exactness recipe: ``value`` is 2-decimal by construction, so
    ``rint(value*100)`` and the JSON ``k`` are exact int64 — all six
    moment sums (n, sx, sy, sxy, sxx, syy) accumulate as INTEGERS per
    batch and merge exactly. The final correlation is computed once per
    group from the same double-cast expression left-to-right as the
    oracle SQL (NOT DuckDB's built-in corr(), whose streaming update
    order differs), then the shared round-at-1e6. All products stay
    < 2^53 at oracle scales (documented bound; a 1000x corpus would move
    the final combine to float128/hugeint)."""
    ev = _rp(sf_dir, "events", columns=["event_type", "value", "props"])

    def partial(t: pa.Table) -> pa.Table:
        k = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>\d+)')
        y = pc.cast(pc.struct_field(k, "k"), pa.int64())
        x = pa.array(np.rint(np.asarray(t["value"]) * 100.0).astype(
            np.int64))
        xy = pc.multiply(x, y)
        xx = pc.multiply(x, x)
        yy = pc.multiply(y, y)
        g = pa.table({"event_type": t["event_type"], "x": x, "y": y,
                      "xy": xy, "xx": xx, "yy": yy}).group_by(
            "event_type").aggregate(
                [("x", "sum"), ("y", "sum"), ("xy", "sum"),
                 ("xx", "sum"), ("yy", "sum"), ([], "count_all")])
        return g.rename_columns(["event_type", "sx", "sy", "sxy", "sxx",
                                 "syy", "n"])

    parts = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=8192)
    # final moment combine through ONE type-keyed exchange (exact int
    # sums merge anywhere); driver sees ≤ n_types rows
    def _fin(d):
        return d.groupby("event_type", sort=False, as_index=False).sum()

    df = (bucketed_group_map(parts, "event_type", _fin, num_buckets=None)
          .to_pandas().sort_values("event_type").reset_index(drop=True))
    n = df["n"].astype("float64").to_numpy()
    sx = df["sx"].astype("float64").to_numpy()
    sy = df["sy"].astype("float64").to_numpy()
    cov = n * df["sxy"].astype("float64").to_numpy() - sx * sy
    vx = n * df["sxx"].astype("float64").to_numpy() - sx * sx
    vy = n * df["syy"].astype("float64").to_numpy() - sy * sy
    corr = cov / np.sqrt(vx * vy)
    return pa.table({
        "event_type": pa.array(df["event_type"], pa.string()),
        "n": pa.array(df["n"].astype("int64")),
        "corr_vk": pa.array(np.rint(corr * 1e6) / 1e6, pa.float64()),
    })


# ---------------------------------------------------------- global order
def global_rank(sf_dir: str):
    """Global ordered rank — the full distributed ORDER BY surface (the
    hash-ordered ``shuffle_order`` doesn't exercise a semantic sort):
    every document ranked by (n_chars DESC, doc_id ASC).

    Two-phase, same contract as shard_pack's prefix sum: ONE distributed
    sort moves each row once; per-block row counts (one int64 per block)
    gather to the driver for the exclusive prefix; ranks then assign
    block-locally. Rank assignment relies on ``to_arrow_refs`` returning
    blocks in sorted order — the invariant shard_pack's oracle-exact +
    parallelism-invariance tests already pin."""
    import ray
    import ray.data as rd

    docs = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    mat = docs.sort(["n_chars", "doc_id"],
                    descending=[True, False]).materialize()
    refs = list(mat.to_arrow_refs())
    if not refs:
        return mat

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def _assign(t: pa.Table, offset: int) -> pa.Table:
        return t.append_column(
            "rn", pa.array(offset + np.arange(1, t.num_rows + 1), pa.int64()))

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int64)
    return rd.from_arrow_refs(
        [_assign.remote(r, int(o)) for r, o in zip(refs, offsets)])


# ----------------------------------------------------------- reshape long
def unpivot_counts(sf_dir: str):
    """UNPIVOT / melt — the inverse reshaping of ``pivot_counts``: the
    wide per-user count table back to long (user_id, event_type, n),
    zero-count cells dropped (the sparse long form).

    The melt itself is a stateless per-batch transform over the pivoted
    dataset: one column concat + a repeat of the key column — no
    shuffle beyond the one already inside pivot_counts. Emitting from
    the WIDE table (rather than re-aggregating the raw events) is the
    point: it exercises wide→long as its own operator."""
    wide = pivot_counts(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        users = np.asarray(t["user_id"], np.int64)
        ids = np.repeat(users, len(EVENT_TYPES))
        types = pa.array(
            np.tile(np.array(EVENT_TYPES, dtype=object), n), pa.string())
        vals = np.empty(n * len(EVENT_TYPES), np.int64)
        for j, name in enumerate(EVENT_TYPES):
            vals[j::len(EVENT_TYPES)] = np.asarray(t[name], np.int64)
        out = pa.table({"user_id": pa.array(ids, pa.int64()),
                        "event_type": types,
                        "n": pa.array(vals, pa.int64())})
        return out.filter(pc.greater(out["n"], 0))

    return wide.map_batches(melt, batch_format="pyarrow",
                            zero_copy_batch=True)


def global_deciles(sf_dir: str):
    """Global NTILE(10) — equal-height decile assignment over the WHOLE
    corpus ordered by (n_chars DESC, doc_id): the global companion of the
    per-group ``value_quartiles``. Same two-phase machinery as
    ``global_rank`` (one distributed sort + per-block counts to the
    driver); each block then assigns buckets locally from its global
    offset using DuckDB-identical ntile arithmetic (first n%10 buckets
    one larger)."""
    import ray
    import ray.data as rd

    docs = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    mat = docs.sort(["n_chars", "doc_id"],
                    descending=[True, False]).materialize()
    refs = list(mat.to_arrow_refs())
    if not refs:
        return mat

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    total = int(np.sum(counts))
    offsets = np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int64)
    size, extra = divmod(total, 10)
    cut = extra * (size + 1)

    @ray.remote
    def _assign(t: pa.Table, offset: int) -> pa.Table:
        pos = offset + np.arange(t.num_rows, dtype=np.int64)
        dec = np.where(pos < cut,
                       pos // (size + 1),
                       extra + (pos - cut) // max(size, 1)) + 1
        return t.append_column("decile", pa.array(dec, pa.int64()))

    return rd.from_arrow_refs(
        [_assign.remote(r, int(o)) for r, o in zip(refs, offsets)])


# ------------------------------------------------------- data validation
def validate_constraints(sf_dir: str):
    """Constraint-validation report (the dbt-test / Deequ data-quality
    family): one row per check with its exact violation count —
    referential integrity (orders.o_custkey -> customer), value range
    (lineitem.l_quantity in [1, 50]), key uniqueness (events.event_id),
    and non-null (documents.text). Passing checks report 0 — the report
    shape is the operator, not the failures.

    Scale shapes per check: FK = build-side key set broadcast once (the
    semi/anti hybrid applies above the threshold); range/non-null =
    stateless per-batch counts summed; uniqueness = per-batch unique
    partial -> one key exchange -> per-bucket distinct count (no task
    holds the global key set)."""
    from ..util import bucketed_group_map

    counts = {}

    # referential integrity: dangling o_custkey = the anti-join count.
    # Reuses the hybrid semi/anti (broadcast key set below the
    # threshold, bucketed exchange above) so a billion-customer build
    # side never materializes on the driver.
    counts["fk_orders_customer"] = int(_semi_anti(
        _rp(sf_dir, "orders", columns=["o_custkey"]),
        _rp(sf_dir, "customer", columns=["c_custkey"]),
        on="o_custkey", right_on="c_custkey", anti=True).count())

    # range check
    def range_viol(t: pa.Table) -> pa.Table:
        q = t["l_quantity"]
        bad = pc.or_(pc.less(q, 1.0), pc.greater(q, 50.0))
        return pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)],
            pa.int64())})

    counts["range_lineitem_quantity"] = int(
        _rp(sf_dir, "lineitem", columns=["l_quantity"])
        .map_batches(range_viol, batch_format="pyarrow",
                     zero_copy_batch=True).to_pandas()["n"].sum())

    # uniqueness: duplicates = total - distinct
    ev = _rp(sf_dir, "events", columns=["event_id"])
    total = ev.count()

    def uniq_partial(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": pa.array(
            np.unique(np.asarray(t["event_id"])), pa.int64())})

    parts = ev.map_batches(uniq_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def bucket_distinct(df):
        return pd.DataFrame({"n": [df["event_id"].nunique()]})

    distinct = int(bucketed_group_map(parts, "event_id", bucket_distinct,
                                      num_buckets=None)
                   .to_pandas()["n"].sum())
    counts["unique_events_event_id"] = total - distinct

    # non-null check
    def null_viol(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t["text"].null_count], pa.int64())})

    counts["notnull_documents_text"] = int(
        _rp(sf_dir, "documents", columns=["text"])
        .map_batches(null_viol, batch_format="pyarrow")
        .to_pandas()["n"].sum())

    names = sorted(counts)
    return pa.table({
        "check_name": pa.array(names, pa.string()),
        "n_violations": pa.array([counts[c] for c in names], pa.int64()),
    })


# ------------------------------------------------------------ CDC diff
def table_diff(sf_dir: str):
    """Snapshot diff (the CDC / change-data-capture family): classify
    every doc as added / removed / changed between the corpus (v1) and a
    deterministic simulated next version (v2: doc_id%13==0 rows dropped,
    %7==0 texts edited, %11==0 rows cloned under doc_id+10^7) —
    unchanged rows are excluded, the normal diff output.

    Scale shape: both versions reduce to (doc_id, md5) map-side, so the
    single doc_id exchange carries 36-byte fingerprints, never text; the
    per-bucket classify is one outer merge + vectorized np.where. The
    v2 rules are shared verbatim with the oracle SQL."""
    import hashlib

    from ..util import bucketed_group_map

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def _md5(arr) -> pa.Array:
        return pa.array(
            [hashlib.md5((s or "").encode()).hexdigest()
             for s in arr.to_pylist()], pa.string())

    def v1_fp(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fp": _md5(t["text"]),
                         "side": pa.array([0] * t.num_rows, pa.int8())})

    def v2_fp(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.int64)
        keep = ids % 13 != 0
        kept_ids = ids[keep]
        text = t["text"].take(pa.array(np.nonzero(keep)[0]))
        edited = pc.if_else(
            pa.array(kept_ids % 7 == 0),
            pc.binary_join_element_wise(text, " v2", ""),
            text)
        out_ids = [kept_ids]
        out_fp = [_md5(edited)]
        clone = kept_ids % 11 == 0
        if clone.any():
            sel = pa.array(np.nonzero(clone)[0])
            out_ids.append(kept_ids[clone] + 10_000_000)
            out_fp.append(_md5(text.take(sel)))
        ids_all = np.concatenate(out_ids)
        fp_all = pa.concat_arrays(out_fp)
        return pa.table({"doc_id": pa.array(ids_all, pa.int64()),
                         "fp": fp_all,
                         "side": pa.array([1] * len(ids_all), pa.int8())})

    v1 = docs.map_batches(v1_fp, batch_format="pyarrow", zero_copy_batch=True)
    v2 = docs.map_batches(v2_fp, batch_format="pyarrow", zero_copy_batch=True)

    def classify(df):
        a = df[df["side"] == 0][["doc_id", "fp"]].rename(
            columns={"fp": "f1"})
        b = df[df["side"] == 1][["doc_id", "fp"]].rename(
            columns={"fp": "f2"})
        j = a.merge(b, on="doc_id", how="outer")
        change = np.where(
            j["f1"].isna(), "added",
            np.where(j["f2"].isna(), "removed",
                     np.where(j["f1"] != j["f2"], "changed", "same")))
        j["change"] = change
        out = j[j["change"] != "same"][["doc_id", "change"]]
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    return bucketed_group_map(v1.union(v2), "doc_id", classify,
                              num_buckets=None)


# ------------------------------------------------------ skew diagnostics
def key_skew_report(sf_dir: str):
    """Key-skew diagnostic report — the introspection pass an engine
    runs before choosing a shuffle plan (salting, broadcast thresholds,
    bucket counts): for each candidate partition key, the distinct-key
    count, the max and total group sizes, and the hottest key (ties to
    the smallest key value). Covers events.user_id, events.event_type
    and orders.o_custkey.

    Per key: per-batch np.unique partials, ONE key exchange, per-bucket
    final group sizes, then a driver merge over per-bucket summaries
    (4 ints per bucket — never the key histogram itself)."""
    from ..util import bucketed_group_map

    specs = [("events", "user_id"), ("events", "event_type"),
             ("orders", "o_custkey")]
    rows = []
    for table, col in specs:
        ds = _rp(sf_dir, table, columns=[col])

        def partial(t: pa.Table, col=col) -> pa.Table:
            arr = t[col]
            if pa.types.is_string(arr.type):
                g = pa.table({col: arr}).group_by(col).aggregate(
                    [([], "count_all")])
                return pa.table({"k": pc.cast(g[col], pa.string()),
                                 "n": g["count_all"]})
            u, c = np.unique(np.asarray(arr), return_counts=True)
            return pa.table({"k": pa.array(u.astype(str), pa.string()),
                             "n": pa.array(c, pa.int64())})

        def bucket_summary(df):
            if not len(df):  # empty exchange bucket
                return pd.DataFrame({"n_keys": pd.Series(dtype="int64"),
                                     "max_n": pd.Series(dtype="int64"),
                                     "top_key": pd.Series(dtype="object"),
                                     "total": pd.Series(dtype="int64")})
            g = df.groupby("k", sort=False, as_index=False)["n"].sum()
            top = g.sort_values(["n", "k"],
                                ascending=[False, True]).iloc[0]
            return pd.DataFrame({
                "n_keys": [len(g)], "max_n": [int(top["n"])],
                "top_key": [str(top["k"])], "total": [int(g["n"].sum())],
            })

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        s = bucketed_group_map(parts, "k", bucket_summary,
                               num_buckets=None).to_pandas()
        hot = s.sort_values(["max_n", "top_key"],
                            ascending=[False, True]).iloc[0]
        rows.append({
            "key": f"{table}.{col}",
            "n_keys": int(s["n_keys"].sum()),
            "total_rows": int(s["total"].sum()),
            "max_group": int(hot["max_n"]),
            "top_key": str(hot["top_key"]),
        })
    rows.sort(key=lambda r: r["key"])
    return pa.table({
        "key": pa.array([r["key"] for r in rows], pa.string()),
        "n_keys": pa.array([r["n_keys"] for r in rows], pa.int64()),
        "total_rows": pa.array([r["total_rows"] for r in rows], pa.int64()),
        "max_group": pa.array([r["max_group"] for r in rows], pa.int64()),
        "top_key": pa.array([r["top_key"] for r in rows], pa.string()),
    })


# ------------------------------------------------------------- profiling
def length_histogram(sf_dir: str, bin_width: int = 100):
    """Equal-width histogram of document lengths (the profiling /
    dataviz pass): bin = floor(n_chars / width) * width, exact counts.
    Stateless per-batch pre-binning collapses each batch to its distinct
    bins before a tiny final groupby — integer-exact."""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "documents", columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        b = (np.asarray(t["n_chars"], np.int64) // bin_width) * bin_width
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return parts.groupby("bin").aggregate(Sum("n", alias_name="n"))


# ---------------------------------------------------------- CDC apply
def upsert_merge(sf_dir: str):
    """MERGE INTO / upsert — the APPLY side of CDC (``table_diff``
    computes the change feed; this folds the same deterministic feed
    into v1 and emits the merged table): removed ids dropped, changed
    rows take the new fingerprint, added rows inserted. Output
    (doc_id, fp) must equal the v2 derivation exactly.

    One doc_id exchange over base ∪ changes; per bucket the change row
    wins by (priority, side) — vectorized drop-duplicates, no per-row
    Python."""
    import hashlib

    from ..util import bucketed_group_map

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def _md5(arr) -> pa.Array:
        return pa.array(
            [hashlib.md5((s or "").encode()).hexdigest()
             for s in arr.to_pylist()], pa.string())

    def base_rows(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fp": _md5(t["text"]),
                         "op": pa.array([0] * t.num_rows, pa.int8())})

    def change_rows(t: pa.Table) -> pa.Table:
        # the same deterministic feed as table_diff's v2 rules:
        # op 2 = delete (%13), op 1 = update (%7), op 1 insert (+1e7 clone)
        ids = np.asarray(t["doc_id"], np.int64)
        text = t["text"]
        out_id, out_fp, out_op = [], [], []
        dele = ids % 13 == 0
        if dele.any():
            out_id.append(ids[dele])
            out_fp.append(pa.array([""] * int(dele.sum()), pa.string()))
            out_op.append(np.full(int(dele.sum()), 2, np.int8))
        upd = (ids % 7 == 0) & ~dele
        if upd.any():
            sel = pa.array(np.nonzero(upd)[0])
            edited = pc.binary_join_element_wise(text.take(sel), " v2", "")
            out_id.append(ids[upd])
            out_fp.append(_md5(edited))
            out_op.append(np.full(int(upd.sum()), 1, np.int8))
        ins = (ids % 11 == 0) & ~dele
        if ins.any():
            sel = pa.array(np.nonzero(ins)[0])
            out_id.append(ids[ins] + 10_000_000)
            out_fp.append(_md5(text.take(sel)))
            out_op.append(np.full(int(ins.sum()), 1, np.int8))
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.string()),
                             "op": pa.array([], pa.int8())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "fp": pa.concat_arrays(out_fp),
            "op": pa.array(np.concatenate(out_op), pa.int8()),
        })

    base = docs.map_batches(base_rows, batch_format="pyarrow",
                            zero_copy_batch=True)
    feed = docs.map_batches(change_rows, batch_format="pyarrow",
                            zero_copy_batch=True)

    def merge(df):
        # change rows (op>0) win over base (op=0); deletes (op=2) drop
        df = df.sort_values(["doc_id", "op"], ascending=[True, False],
                            kind="mergesort")
        keep = df.drop_duplicates("doc_id", keep="first")
        keep = keep[keep["op"] != 2]
        return keep[["doc_id", "fp"]]

    return bucketed_group_map(base.union(feed), "doc_id", merge,
                              num_buckets=None)


# ------------------------------------------------------- graph construct
def cooccurrence_pairs(sf_dir: str):
    """Co-occurrence graph construction (the network-mining pass): user
    pairs that act on the same (event_type, day) cell, with the number
    of distinct cells they share. Canonical u1 < u2 orientation.

    One exchange on the cell key co-locates each cell; per bucket the
    pair explosion is vectorized (np.triu_indices per cell over the
    cell's DISTINCT users) and immediately pre-aggregated, so only
    (u1, u2, n) partials leave the bucket; a second small exchange sums
    them. Cells above ``max_cell`` users are dropped AND counted via the
    same stop-key policy the ER blocker uses (a hot cell would explode
    quadratically at scale); the registered oracle SQL carries the
    IDENTICAL cap so both sides drop the same cells at every sf."""
    from ..state.stats import report_oversize
    from ..util import bucketed_group_map

    ev = _rp(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    max_cell = 512

    def cells(t: pa.Table) -> pa.Table:
        us = np.asarray(t["ts"], dtype="datetime64[us]").astype(np.int64)
        day = us // 86_400_000_000
        key = pc.binary_join_element_wise(
            pc.cast(t["event_type"], pa.string()),
            pa.array(day.astype(str)), "|")
        g = pa.table({"cell": key,
                      "user_id": pc.cast(t["user_id"], pa.int64())}
                     ).group_by(["cell", "user_id"]).aggregate([])
        return g

    parts = ev.map_batches(cells, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=8192)

    def pair_gen(df):
        out_u1, out_u2 = [], []
        dropped_cells = dropped_rows = 0
        for _, grp in df.groupby("cell", sort=False):
            users = np.unique(grp["user_id"].to_numpy())
            n = len(users)
            if n > max_cell:
                dropped_cells += 1
                dropped_rows += n
                continue
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            out_u1.append(users[i])
            out_u2.append(users[j])
        report_oversize("cooccurrence", dropped_cells, dropped_rows,
                        "drop")
        if not out_u1:
            return pd.DataFrame({"u1": pd.Series(dtype="int64"),
                                 "u2": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        u1 = np.concatenate(out_u1)
        u2 = np.concatenate(out_u2)
        d = pd.DataFrame({"u1": u1, "u2": u2})
        return (d.groupby(["u1", "u2"], sort=False).size()
                .rename("n").reset_index())

    pairs = bucketed_group_map(parts, "cell", pair_gen, num_buckets=None)

    def fin(df):
        return df.groupby(["u1", "u2"], sort=False, as_index=False)[
            "n"].sum()

    return bucketed_group_map(pairs, "u1", fin, num_buckets=None)


def table_profile(sf_dir: str):
    """Column-profile report (the describe()/PROFILE surface): for each
    documents column — null count, exact distinct count, min and max
    (VARCHAR form so one schema covers all types).

    SINGLE data pass (VERDICT r4 #4 — the old shape scanned once per
    column per statistic): one map_batches emits, per batch, every
    column's distinct values as long (column, v) rows, with the batch's
    null count and NATIVE-TYPED min/max riding on each column segment's
    first row (a string round-trip would make the combine lexicographic
    — "100" < "99" — and an all-null block's None would coerce the
    pandas reduce to float, rendering '1.0'; typed Arrow min/max skip
    nulls instead). The materialized partials then feed (a) one
    value-keyed exchange for the exact distinct counts (null v ignored,
    matching count(DISTINCT)) and (b) a driver gather of only the
    marker rows (≤ batches × columns) for nulls/min/max."""
    from ..util import bucketed_group_map, dataset_to_arrow

    cols = ["doc_id", "lang", "n_chars"]
    ds = _rp(sf_dir, "documents", columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        # types come from the batch itself — a driver-side ds.schema()
        # would cost an extra plan execution
        types = {c: t.schema.field(c).type for c in cols}
        segs = []
        for c in cols:
            arr = t[c]
            valid = arr.drop_null()
            vals = pa.table({c: valid}).group_by(c).aggregate([])[c]
            n = len(vals)
            if n == 0 and arr.null_count == 0:
                continue
            rows = max(n, 1)  # all-null batch: one null-v marker row
            seg = {
                "column": pa.array([c] * rows, pa.string()),
                "v": (pc.cast(vals, pa.string()) if n
                      else pa.nulls(1, pa.string())),
                "nulls": pa.array(
                    [arr.null_count] + [None] * (rows - 1), pa.int64()),
            }
            for c2 in cols:
                if c2 == c and n:
                    mn, mx = pc.min(valid).as_py(), pc.max(valid).as_py()
                    seg[f"mn_{c2}"] = pa.array(
                        [mn] + [None] * (rows - 1), types[c2])
                    seg[f"mx_{c2}"] = pa.array(
                        [mx] + [None] * (rows - 1), types[c2])
                else:
                    seg[f"mn_{c2}"] = pa.nulls(rows, types[c2])
                    seg[f"mx_{c2}"] = pa.nulls(rows, types[c2])
            segs.append(pa.table(seg))
        if not segs:
            fields = {"column": pa.array([], pa.string()),
                      "v": pa.array([], pa.string()),
                      "nulls": pa.array([], pa.int64())}
            for c2 in cols:
                fields[f"mn_{c2}"] = pa.array([], types[c2])
                fields[f"mx_{c2}"] = pa.array([], types[c2])
            return pa.table(fields)
        return pa.concat_tables(segs)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def nd_bucket(df):
        d = df[["column", "v"]].dropna(subset=["v"]).drop_duplicates()
        g = d.groupby("column", sort=False).size()
        return pd.DataFrame({"column": g.index.astype(str),
                             "nd": g.to_numpy().astype("int64")})

    nd_parts = (bucketed_group_map(
        parts.select_columns(["column", "v"]), "v", nd_bucket,
        num_buckets=None).to_pandas())
    nd = nd_parts.groupby("column")["nd"].sum().to_dict()

    def markers(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["nulls"])).drop_columns(["v"])

    summ = dataset_to_arrow(parts.map_batches(
        markers, batch_format="pyarrow", zero_copy_batch=True))
    rows = []
    for c in cols:
        sub = summ.filter(pc.equal(summ["column"], c))
        mn = pc.min(sub[f"mn_{c}"]).as_py()  # typed reduce, nulls skipped
        mx = pc.max(sub[f"mx_{c}"]).as_py()
        rows.append({
            "column": c,
            "n_nulls": int(pc.sum(sub["nulls"]).as_py() or 0),
            "n_distinct": int(nd.get(c, 0)),
            "min_v": None if mn is None else str(mn),
            "max_v": None if mx is None else str(mx),
        })
    rows.sort(key=lambda r: r["column"])
    return pa.table({
        "column": pa.array([r["column"] for r in rows], pa.string()),
        "n_nulls": pa.array([r["n_nulls"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
        "min_v": pa.array([r["min_v"] for r in rows], pa.string()),
        "max_v": pa.array([r["max_v"] for r in rows], pa.string()),
    })


def group_size_histogram(sf_dir: str):
    """Aggregate-of-aggregate: the distribution of per-user event counts
    (how many users have exactly n events) — the fan-out profile that
    sizes blocking caps and join strategies. Two levels, both exchanges
    bounded: per-batch user-count partials -> user-keyed exchange for
    exact per-user totals collapsed to per-bucket histogram partials ->
    tiny final groupby over (n_events, n_users) rows."""
    from ray.data.aggregate import Sum

    from ..util import bucketed_group_map

    ev = _rp(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(np.asarray(t["user_id"]), return_counts=True)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    parts = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def bucket_hist(df):
        totals = df.groupby("user_id", sort=False)["n"].sum()
        h = totals.value_counts()
        return pd.DataFrame({"n_events": h.index.astype("int64"),
                             "n_users": h.to_numpy().astype("int64")})

    hist = bucketed_group_map(parts, "user_id", bucket_hist,
                              num_buckets=None)
    return hist.groupby("n_events").aggregate(
        Sum("n_users", alias_name="n_users"))
