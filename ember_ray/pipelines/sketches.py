"""Cardinality / quantile operators over the driver testdata tables.

Extensions beyond the reference (which has no sketching — its statistics
scripts compute exact pandas counts, ``scripts/statistics/stat_ali.py:9-20``):
at 100 TB a training-data pipeline needs mergeable one-pass summaries —
distinct counts (vocabulary sizes, unique-user counts) and quantiles
(latency / length distributions) — that never materialize the full value
set on any single worker.

Three operators:

* ``distinct_count`` — EXACT count-distinct, scale-shaped: per-block
  unique (map-side volume reduction) → one hash exchange on the value →
  per-bucket unique count → tiny sum. No single task ever sees more than
  one hash bucket of distinct values. Oracle: ``count(DISTINCT ...)``.
* ``distinct_count_hll`` — HyperLogLog sketch (Flajolet et al. 2007,
  the one-pass mergeable scale path): each batch folds into a 2^p-register
  array (16 KiB at p=14), partials merge by element-wise max — a shuffle
  of 16 KiB rows regardless of input size. Deterministic (stable_hash64),
  but not SQL-expressible → rows-only, accuracy pytest-gated against the
  exact count (expected rel. std. err. 1.04/sqrt(2^p) ≈ 0.8 % at p=14).
* ``group_quantiles`` — per-group EXACT p50/p95 via one hash exchange on
  the group key; interpolation mirrors DuckDB ``quantile_cont``
  (lower + (upper-lower)*frac at rank q*(n-1)) so the oracle matches
  bitwise after the shared rint-rounding recipe. Partitioning assumption:
  one group's values fit a reduce task (event-type cardinality is tiny).
* ``group_quantiles_sketch`` — the scale path for huge groups
  (quantiles-by-user at 100 TB): mergeable KLL partials per input block,
  so no task ever holds a group's full value vector (``KLLSketch``;
  accuracy pytest-gated vs the exact path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 14  # 2^14 registers = 16 KiB per partial


def _rp(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    import os

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


# ------------------------------------------------------------ exact distinct
def distinct_count(sf_dir: str, table: str = "events",
                   column: str = "user_id", num_buckets: int = 32):
    """Exact global count-distinct, one row ``{n_distinct}``."""
    from ..util import hash_exchange

    ds = _rp(sf_dir, table, columns=[column])

    def _block_unique(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({column: pc.unique(t[column])})

    def _bucket_count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(pc.unique(t[column])) if t.num_rows else 0
        return pa.table({"n_distinct": pa.array([n], pa.int64())})

    parts = hash_exchange(
        ds.map_batches(_block_unique, batch_format="pyarrow",
                       zero_copy_batch=True),
        key=column, num_buckets=num_buckets, reduce_fn=_bucket_count,
        arrow=True)
    total = int(parts.sum("n_distinct") or 0)
    return pa.table({"n_distinct": pa.array([total], pa.int64())})


def group_distinct_count(sf_dir: str, table: str = "events",
                         group: str = "event_type", column: str = "user_id",
                         num_buckets: int = 32):
    """Per-GROUP exact count-distinct (``count(DISTINCT user_id) GROUP BY
    event_type``): per-batch (group, value) pair dedup (map-side volume
    reduction) → one hash exchange on the VALUE (a value lives in exactly
    one bucket, so per-bucket distinct pairs are globally distinct) →
    per-bucket per-group counts → tiny final sum. No task ever holds a
    group's full distinct set."""
    from ray.data.aggregate import Sum

    from ..util import hash_exchange

    ds = _rp(sf_dir, table, columns=[group, column])

    def _pairs(t: pa.Table) -> pa.Table:
        g = t.group_by([group, column]).aggregate([([], "count_all")])
        return g.select([group, column])

    parts = ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group: pa.array([], pa.string()),
                             "n_distinct": pa.array([], pa.int64())})
        d = t.group_by([group, column]).aggregate([([], "count_all")])
        g = d.group_by(group).aggregate([([], "count_all")])
        return pa.table({group: g[group], "n_distinct": g["count_all"]})

    out = hash_exchange(parts, key=column, num_buckets=num_buckets,
                        reduce_fn=_bucket, arrow=True)
    return out.groupby(group).aggregate(Sum("n_distinct",
                                            alias_name="n_distinct"))


# ---------------------------------------------------------------- HLL sketch
def _hll_partial(values: pa.ChunkedArray | pa.Array, p: int) -> np.ndarray:
    """Fold a value array into a 2^p uint8 register array (vectorized)."""
    from ..util import stable_hash64

    h = stable_hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rho = leading-zero count of the low (64-p) bits + 1; w < 2^50 so
    # float64 log2 is exact enough for floor (53-bit mantissa)
    bits = np.zeros(len(w), np.int64)
    nz = w > 0
    bits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rho = ((64 - p) - bits + 1).astype(np.uint8)
    reg = np.zeros(1 << p, np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction — the large-range correction is unnecessary with 64-bit
    hashes (Heule et al. 2013, HLL++ observation)."""
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


def distinct_count_hll(sf_dir: str, table: str = "events",
                       column: str = "user_id", p: int = HLL_P):
    """One-pass mergeable distinct-count sketch; one row
    ``{n_distinct_est, n_registers}``. Each batch contributes a 2^p
    register row; the driver merges k×16 KiB partials (k = #blocks) by
    element-wise max — the only data movement besides the pruned read."""
    ds = _rp(sf_dir, table, columns=[column])

    def _partial(t: pa.Table) -> pa.Table:
        reg = _hll_partial(t[column], p)
        return pa.table({
            "reg": pa.FixedSizeListArray.from_arrays(
                pa.array(reg, pa.uint8()), len(reg)),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    merged = np.zeros(1 << p, np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow"):
        flat = np.asarray(b["reg"].combine_chunks().flatten())
        np.maximum(merged, flat.reshape(-1, 1 << p).max(axis=0), out=merged)
    return pa.table({
        "n_distinct_est": pa.array([int(round(hll_estimate(merged)))],
                                   pa.int64()),
        "n_registers": pa.array([1 << p], pa.int64()),
    })


# ----------------------------------------------------------- group quantiles
_QS = (0.5, 0.95)


def _quantile_cont(v: np.ndarray, q: float) -> float:
    """DuckDB quantile_cont interpolation: lower + (upper-lower)*frac at
    rank q*(n-1), computed in the same association order."""
    pos = q * (len(v) - 1)
    lo = int(np.floor(pos))
    frac = pos - lo
    if frac == 0.0:
        return float(v[lo])
    return float(v[lo] + (v[lo + 1] - v[lo]) * frac)


# Exact per-group quantiles need the whole group's values in ONE reduce
# task (hash_exchange scales BUCKET count with bytes, but a single hot
# key cannot be split across buckets). Gate loudly instead of OOMing:
# a group above this many values raises with the sketch-path pointer.
EXACT_GROUP_QUANTILE_CAP = 32_000_000  # 32M float64 = 256 MB


def group_quantiles(sf_dir: str, ndigits: int = 6,
                    group_cap: int = EXACT_GROUP_QUANTILE_CAP):
    """Per-event_type exact p50/p95 of ``value`` + count. One hash
    exchange on the group key; values sort per group inside the reduce.

    Scale contract: distinct-key cardinality is unbounded (the exchange
    adds buckets by the memory rule; the kernel is fully vectorized —
    one sort + gather per bucket, no per-group Python). A single HOT
    group, however, must fit one task: above ``group_cap`` values the
    reduce raises ``NotImplementedError`` naming the mergeable-sketch
    path (``group_quantiles_sketch``), never a silent OOM/wrong answer.
    """
    from ..util import hash_exchange

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    scale = float(10 ** ndigits)

    def _bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "p50": pa.array([], pa.float64()),
                "p95": pa.array([], pa.float64()),
            })
        d = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = np.asarray(d.indices, np.int64)
        vals = np.asarray(t["value"], np.float64)
        order = np.lexsort((vals, codes))
        cs, vs = codes[order], vals[order]
        bounds = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1], True])
        starts, ends = bounds[:-1], bounds[1:]
        sizes = ends - starts
        if sizes.max() > group_cap:
            hot = d.dictionary[int(cs[starts[int(np.argmax(sizes))]])]
            raise NotImplementedError(
                f"group_quantiles: group {hot!r} holds {int(sizes.max())} "
                f"values (> cap {group_cap}); exact quantiles need the "
                "whole group in one task. Use group_quantiles_sketch "
                "(mergeable KLL) for hot keys at this scale."
            )

        def q_at(q: float) -> np.ndarray:
            # vectorized DuckDB quantile_cont: lower + (upper-lower)*frac
            # at rank q*(n-1), per group (same math as _quantile_cont)
            pos = q * (sizes - 1)
            fl = np.floor(pos)
            lo = starts + fl.astype(np.int64)
            frac = pos - fl
            hi = np.minimum(lo + 1, ends - 1)
            res = vs[lo] + (vs[hi] - vs[lo]) * frac
            return np.rint(res * scale) / scale

        return pa.table({
            "event_type": d.dictionary.take(pa.array(cs[starts])),
            "n": pa.array(sizes, pa.int64()),
            "p50": pa.array(q_at(0.5), pa.float64()),
            "p95": pa.array(q_at(0.95), pa.float64()),
        })

    return hash_exchange(ds, key="event_type", num_buckets=8,
                         reduce_fn=_bucket, arrow=True)


# ------------------------------------------------- mergeable quantile sketch
class KLLSketch:
    """Deterministic KLL-style mergeable quantile sketch (Karnin, Lang,
    Liberty 2016): geometric level buffers; an over-capacity level sorts
    and promotes every other element with doubled weight. The compaction
    offset alternates deterministically instead of randomly — it trades
    the formal unbiasedness proof for run-to-run reproducibility (the O6
    determinism rule); empirical rank error stays ~O(1/k) (pytest-gated).

    This is the VERDICT r3 #5 scale path for ``group_quantiles``: a group
    never needs to fit one task — each block contributes an O(k·log(n/k))
    sketch, sketches merge associatively in the group's reduce task, and
    only sketch bytes (not values) move through the exchange.
    """

    __slots__ = ("k", "n", "levels", "_flip")

    def __init__(self, k: int = 200):
        self.k = k
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._flip = 0

    def update(self, vals: np.ndarray) -> "KLLSketch":
        vals = np.asarray(vals, np.float64)
        self.n += len(vals)
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        self.n += other.n
        for h, buf in enumerate(other.levels):
            if h == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self._compress()
        return self

    def _cap(self, h: int, height: int) -> int:
        # top level gets k; each level below shrinks by 2/3 (KLL schedule)
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** (height - 1 - h))))

    def _compress(self) -> None:
        while True:
            height = len(self.levels)
            for h in range(height):
                buf = self.levels[h]
                if buf.size <= self._cap(h, height):
                    continue
                buf = np.sort(buf)
                rem = buf[:1] if buf.size % 2 else buf[:0]
                buf = buf[buf.size % 2:]
                off = self._flip & 1
                self._flip += 1
                self.levels[h] = rem
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], buf[off::2]])
                break
            else:
                return

    def quantile(self, q: float) -> float:
        """Weighted rank selection: smallest value whose cumulative weight
        reaches q·W (weight of level h is 2^h)."""
        vals = np.concatenate(self.levels)
        if not len(vals):
            return float("nan")
        wts = np.concatenate([
            np.full(len(buf), 1 << h, np.int64)
            for h, buf in enumerate(self.levels)
        ])
        order = np.argsort(vals, kind="stable")
        cw = np.cumsum(wts[order])
        target = q * cw[-1]
        return float(vals[order][np.searchsorted(cw, target, side="left")])

    def flatten(self) -> tuple[np.ndarray, np.ndarray]:
        """(values, level_ids) — the wire format through an exchange."""
        vals = np.concatenate(self.levels)
        lvls = np.concatenate([
            np.full(len(buf), h, np.int32)
            for h, buf in enumerate(self.levels)
        ]) if len(vals) else np.empty(0, np.int32)
        return vals, lvls

    @classmethod
    def from_flat(cls, vals: np.ndarray, lvls: np.ndarray, n: int,
                  k: int = 200) -> "KLLSketch":
        s = cls(k)
        s.n = int(n)
        top = int(lvls.max()) + 1 if len(lvls) else 1
        s.levels = [np.ascontiguousarray(vals[lvls == h], np.float64)
                    for h in range(top)]
        return s


def group_quantiles_sketch(sf_dir: str, k: int = 200, ndigits: int = 6):
    """Per-event_type APPROXIMATE p50/p95 via mergeable KLL partials —
    the ``group_quantiles`` scale path: each input block emits one
    (group, sketch) row; the group exchange moves only sketch bytes; the
    reduce merges sketches, so no task ever holds a group's full value
    vector. Accuracy is pytest-gated against the exact path (rows-only in
    the driver: rank-selection estimates are not SQL-expressible)."""
    from ..util import hash_exchange

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    scale = float(10 ** ndigits)

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "vals": pa.array([], pa.list_(pa.float64())),
                "lvls": pa.array([], pa.list_(pa.int32())),
            })
        d = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = np.asarray(d.indices, np.int64)
        vals = np.asarray(t["value"], np.float64)
        order = np.argsort(codes, kind="stable")
        cs, vs = codes[order], vals[order]
        bounds = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1], True])
        dict_vals = d.dictionary.to_pylist()
        names, ns, fv, fl = [], [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sk = KLLSketch(k).update(vs[s:e])
            v, l = sk.flatten()
            names.append(dict_vals[cs[s]])
            ns.append(sk.n)
            fv.append(v)
            fl.append(l)
        return pa.table({
            "event_type": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "vals": pa.array([v.tolist() for v in fv], pa.list_(pa.float64())),
            "lvls": pa.array([l.tolist() for l in fl], pa.list_(pa.int32())),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=8192)

    def _reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "p50": pa.array([], pa.float64()),
                "p95": pa.array([], pa.float64()),
            })
        names, ns, p50s, p95s = [], [], [], []
        df = t.to_pandas()
        for name, g in df.groupby("event_type", sort=False):
            merged = KLLSketch(k)
            for _, row in g.iterrows():
                merged.merge(KLLSketch.from_flat(
                    np.asarray(row["vals"], np.float64),
                    np.asarray(row["lvls"], np.int32),
                    row["n"], k))
            names.append(name)
            ns.append(merged.n)
            p50s.append(np.rint(merged.quantile(0.5) * scale) / scale)
            p95s.append(np.rint(merged.quantile(0.95) * scale) / scale)
        return pa.table({
            "event_type": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "p50": pa.array(p50s, pa.float64()),
            "p95": pa.array(p95s, pa.float64()),
        })

    return hash_exchange(parts, key="event_type", num_buckets=8,
                         reduce_fn=_reduce, arrow=True)


# --------------------------------------------------------- heavy hitters
def _mg_compress(g: "pa.Table", total: int, dropped: int,
                 capacity: int) -> "pa.Table":
    """Compress a (token, n) count table to a Misra-Gries summary of at
    most ``capacity`` RESIDUAL counters: subtract the (capacity+1)-th
    largest count from everything, keep the positive ones. Appends one
    null-token row carrying (total token count, cumulative counters
    dropped) so merges need no side channel. dropped == 0 end-to-end
    means no compression ever happened → the summary is exact."""
    import pyarrow.compute as pc

    cnt = g["n"].to_numpy()
    if len(cnt) > capacity:
        thr = int(np.partition(cnt, len(cnt) - capacity - 1)[
            len(cnt) - capacity - 1])
        keep = cnt > thr
        dropped += int(len(cnt) - keep.sum())
        g = pa.table({"token": g["token"].filter(pa.array(keep)),
                      "n": pa.array(cnt[keep] - thr)})
    return pa.table({
        "token": pa.concat_arrays(
            [g["token"].combine_chunks(), pa.array([None], pa.string())]),
        "n": pa.concat_arrays(
            [g["n"].combine_chunks(), pa.array([total], pa.int64())]),
        "dropped": pa.concat_arrays(
            [pa.array(np.zeros(g.num_rows, np.int64)),
             pa.array([dropped], pa.int64())]),
    })


def heavy_hitters(sf_dir: str, k: int = 20, capacity: int = 4096,
                  num_buckets: int = 8):
    """EXACT top-k frequent tokens at sketch cost — the Misra-Gries →
    exact-recount two-pass pattern (Misra & Gries 1982; the standard
    scale shape when the vocabulary is too large to shuffle whole).

    Pass 1 (candidates): per block, exact token counts (one Arrow
    ``group_by``) compressed to a Misra-Gries summary of ``capacity``
    counters — subtract the (capacity+1)-th largest count, keep the
    positive RESIDUAL counts. Summaries are MERGEABLE (Agarwal et al.,
    "Mergeable Summaries", PODS'12): concat + group-sum + re-compress
    preserves the total undercount bound ≤ N/capacity, so the per-block
    summaries tree-reduce through Ray tasks to ONE capacity-bounded
    summary — the driver never holds more than ``capacity`` candidate
    rows no matter how many blocks the corpus has (at 1e6 blocks a
    naive union gather would be 4e9 rows). A token with true count
    > N/capacity keeps a positive merged residual, so the final
    summary's key set provably contains every possible top-k member
    whenever the k-th count > N/capacity (checked at the end; raises
    rather than silently returning a wrong top-k). Each block also
    emits one null-token row carrying its total token count and
    dropped-counter tally so N needs no extra pass.

    Pass 2 (exact): the ≤ capacity candidates broadcast once via
    ``ray.put``; each block re-tokenizes and counts ONLY candidate
    tokens; one tiny hash exchange sums per-token partials; the driver
    sorts ≤ capacity rows with the deterministic (count DESC, token
    ASC) tie-break. No stage ever shuffles the full token stream.
    """
    import os

    import pyarrow.compute as pc
    import ray

    from ..functions.text import tokenize_array
    from ..util import hash_exchange

    path = os.path.join(sf_dir, "documents.parquet")

    def _mg_summary(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        vals = toks.values
        total = len(vals)
        if total == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "dropped": pa.array([], pa.int64())})
        g = pa.table({"token": vals}).group_by("token").aggregate(
            [([], "count_all")])
        g = pa.table({"token": g["token"],
                      "n": pc.cast(g["count_all"], pa.int64())})
        return _mg_compress(g, total, 0, capacity)

    import ray.data as rd

    @ray.remote
    def _merge_mg(*tbls: pa.Table) -> pa.Table:
        tbls = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
                for t in tbls]
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "dropped": pa.array([], pa.int64())})
        cat = pa.concat_tables(tbls, promote_options="default")
        nulls = cat.filter(pc.is_null(cat["token"]))
        total = int(pc.sum(nulls["n"]).as_py() or 0)
        dropped = int(pc.sum(nulls["dropped"]).as_py() or 0)
        toks = cat.filter(pc.is_valid(cat["token"]))
        g = toks.group_by("token").aggregate([("n", "sum")])
        g = pa.table({"token": g["token"], "n": g["n_sum"]})
        return _mg_compress(g, total, dropped, capacity)

    ds = rd.read_parquet(path, columns=["text"])
    summaries = ds.map_batches(_mg_summary, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=4096)
    # tree-reduce the mergeable summaries: the driver only ever handles
    # ObjectRefs + ONE final capacity-bounded table
    refs = list(summaries.to_arrow_refs())
    fan_in = 16
    while len(refs) > 1:
        refs = [_merge_mg.remote(*refs[i:i + fan_in])
                for i in range(0, len(refs), fan_in)]
    merged = ray.get(refs[0]) if refs else pa.table(
        {"token": pa.array([], pa.string()),
         "n": pa.array([], pa.int64()),
         "dropped": pa.array([], pa.int64())})
    null_rows = merged.filter(pc.is_null(merged["token"]))
    total_n = int(pc.sum(null_rows["n"]).as_py() or 0)
    total_dropped = int(pc.sum(null_rows["dropped"]).as_py() or 0)
    cand = merged.filter(pc.is_valid(merged["token"]))["token"]\
        .combine_chunks()
    cand_ref = ray.put(cand)

    def _exact_partial(t: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        toks = tokenize_array(t["text"])
        vals = toks.values.filter(pc.is_in(toks.values, value_set=cset))
        if len(vals) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pa.table({"token": vals}).group_by("token").aggregate(
            [([], "count_all")])
        return pa.table({"token": g["token"], "n": g["count_all"]})

    def _bucket_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by("token").aggregate([("n", "sum")])
        return pa.table({"token": g["token"], "n": g["n_sum"]})

    partials = ds.map_batches(_exact_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=4096)
    out = hash_exchange(partials, key="token", num_buckets=num_buckets,
                        reduce_fn=_bucket_sum, arrow=True)
    empty = pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    blocks = []
    for b in ray.get(out.to_arrow_refs()):
        t = (pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
             else b)
        if t.num_rows:
            blocks.append(t)
    final = (pa.concat_tables(blocks, promote_options="default")
             if blocks else empty)
    order = pc.sort_indices(final, sort_keys=[("n", "descending"),
                                              ("token", "ascending")])
    top = final.take(order[:k])
    if total_dropped and total_n:
        # some block compressed away counters → top-k is exact ONLY if the
        # k-th count clears the pigeonhole bound; otherwise refuse
        kth = top["n"][k - 1].as_py() if top.num_rows >= k else 0
        if top.num_rows < k or kth <= total_n / capacity:
            raise ValueError(
                f"heavy_hitters exactness bound violated: k-th count "
                f"{kth} <= N/capacity = {total_n / capacity:.1f} — "
                f"raise capacity")
    return top
