"""Shared utilities: stable content-derived hashing and bucketed group maps.

Determinism rule (SURVEY.md §4 "Determinism"): all bucketing / salting /
splitting is content-hash-derived, never RNG- or time-derived, so two runs
(and two cluster sizes) produce identical partitioning decisions.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_SEED = 142  # reference's global seed (build_ali_dataset.py:14)


def stable_hash64(values, seed: int = _HASH_SEED) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string/int array → uint64 ndarray.

    Uses polars' xxhash kernel (seeded, process-independent) — unlike
    Python's ``hash()`` this is stable across workers and runs.
    """
    import polars as pl

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values)
    else:
        s = pl.Series(values)
    return s.hash(seed=seed).to_numpy()


def bucket_of(values, num_buckets: int, seed: int = _HASH_SEED) -> np.ndarray:
    """Deterministic bucket id in [0, num_buckets) per value."""
    return (stable_hash64(values, seed) % np.uint64(num_buckets)).astype(np.int64)


def add_bucket_column(
    ds,
    key: str,
    num_buckets: int,
    col: str = "__bucket",
    seed: int = _HASH_SEED,
):
    """Append a deterministic hash-bucket column to a Dataset (zero-copy Arrow)."""

    def _tag(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch[key], num_buckets, seed)
        return batch.append_column(col, pa.array(b, pa.int64()))

    return ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)


def _pack_table(tbl: pa.Table, codec: str) -> pa.Buffer:
    """Arrow-IPC-serialize ``tbl`` with per-buffer ``codec`` compression
    (lz4 ~1.9×, 263 MB/s enc / 1.8 GB/s dec per core on the transcript
    corpus). Used by the exchange split so bucket slices cross the object
    store at the compressed size — halves plasma (single-node) / network
    (multi-node) bytes through the assemble exchange, the stage that
    tracks DRAM-bandwidth weather (BASELINE.md regime notes)."""
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression=codec)
    with pa.ipc.new_stream(sink, tbl.schema, options=opts) as w:
        w.write_table(tbl)
    return sink.getvalue()


def _unpack_table(obj) -> pa.Table:
    if isinstance(obj, (pa.Buffer, bytes, memoryview)):
        return pa.ipc.open_stream(obj).read_all()
    return obj


def _exchange_split(tbl: pa.Table, key: str, num_buckets: int, seed: int,
                    codec: str | None = None):
    """One input block → ``num_buckets`` zero-copy slices grouped by
    ``hash(key) % num_buckets`` (one argsort + one take, NO value sort).
    ``codec``: IPC-compress each slice (see ``_pack_table``)."""
    if tbl.num_rows == 0:
        empty = tbl.slice(0, 0)
        return tuple(empty for _ in range(num_buckets))
    if key not in tbl.schema.names:
        # a non-empty block missing the exchange key is schema drift — an
        # empty-slices fallback here would silently DROP the block's rows
        raise KeyError(
            f"hash_exchange: key {key!r} absent from non-empty block "
            f"(columns: {tbl.schema.names})"
        )
    if any(c.num_chunks > 1 for c in tbl.columns):
        # flat columns: chunked take is ~60× slower (see flatten_chunked)
        tbl = pa.table({n: flatten_chunked(tbl[n]) for n in tbl.schema.names})
    b = bucket_of(tbl[key], num_buckets, seed)
    order = np.argsort(b, kind="stable")
    taken = tbl.take(pa.array(order))
    bounds = np.searchsorted(b[order], np.arange(num_buckets + 1))
    slices = [
        taken.slice(bounds[p], bounds[p + 1] - bounds[p])
        for p in range(num_buckets)
    ]
    if codec:
        return tuple(
            _pack_table(s, codec) if s.num_rows else s for s in slices)
    return tuple(slices)


def _exchange_reduce(fn, *tables):
    tables = [_unpack_table(t) for t in tables]
    live = [t for t in tables if t.num_rows]
    base = live if live else list(tables[:1])
    cols = base[0].schema.names  # align column order across source blocks
    df = pa.concat_tables(t.select(cols) for t in base).to_pandas()
    out = fn(df)
    return pa.Table.from_pandas(out, preserve_index=False)


def _exchange_reduce_arrow(fn, *tables):
    tables = [_unpack_table(t) for t in tables]
    live = [t for t in tables if t.num_rows]
    base = live if live else list(tables[:1])
    cols = base[0].schema.names
    return fn(pa.concat_tables(t.select(cols) for t in base))


TARGET_BUCKET_BYTES = 256 << 20  # reduce tasks concat their whole bucket
                                 # in memory — bound a bucket to ~256 MB


def _auto_buckets(mat, target_bucket_bytes: int = TARGET_BUCKET_BYTES,
                  max_buckets: int = 1024) -> int:
    """Bucket count from the materialized input's byte size: enough that a
    bucket always fits a worker's heap (``target_bucket_bytes``) but at
    least the cluster's CPU count (parallelism), capped (task fan-out).
    Callers that pass ``num_buckets=None`` get this rule instead of a
    hand config that silently stops fitting at 1000× the data."""
    import ray

    size = mat.size_bytes() or 0
    by_mem = -(-size // max(1, target_bucket_bytes))
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return int(min(max_buckets, max(ncpu, by_mem, 1)))


def hash_exchange(ds, key: str, num_buckets: int | None, reduce_fn,
                  seed: int = _HASH_SEED, arrow: bool = False,
                  target_bucket_bytes: int = TARGET_BUCKET_BYTES,
                  codec: str | None = None):
    """Raw-Ray-task hash exchange: split each materialized input block into
    ``num_buckets`` zero-copy slices by ``hash(key) % num_buckets``, then
    one reduce task per bucket applies ``reduce_fn`` to the concatenated
    bucket (pandas DataFrame, or pa.Table when ``arrow=True``).

    ``num_buckets=None`` → auto-size from the materialized input bytes
    (``_auto_buckets``): a bucket never exceeds ``target_bucket_bytes``
    regardless of input scale.

    Replaces ``Dataset.groupby(bucket).map_groups``: Ray 2.49's sort-based
    shuffle value-sorts the entire payload to co-locate a small bucket key
    (measured 2-3× slower end-to-end), and its hash-shuffle strategy
    stalls on this workload. The input materializes at the exchange
    boundary (round-1 barrier rule); task lineage retry still applies.
    """
    import ray
    import ray.data as rd
    from ray.data.dataset import MaterializedDataset

    mat = ds if isinstance(ds, MaterializedDataset) else ds.materialize()
    if num_buckets is None:
        num_buckets = _auto_buckets(mat, target_bucket_bytes)
    else:
        # a tuned bucket count is a parallelism hint, not a memory
        # contract: reduce tasks concat their whole bucket, so when the
        # input outgrows caller config the memory rule wins (results are
        # bucket-count-invariant — tested)
        by_mem = -(-(mat.size_bytes() or 0) // max(1, target_bucket_bytes))
        if by_mem > num_buckets:
            num_buckets = int(min(1024, by_mem))
    blocks = list(mat.to_arrow_refs())
    if not blocks:
        sch = mat.schema()
        if sch is None:
            return mat
        empty = pa.Table.from_pylist(
            [], schema=pa.schema(list(zip(sch.names, sch.types))))
        out = reduce_fn(empty if arrow else empty.to_pandas())
        return rd.from_arrow(
            out if arrow else pa.Table.from_pandas(out, preserve_index=False))
    reduce = _cached_remote(_exchange_reduce_arrow if arrow else _exchange_reduce)
    if num_buckets == 1:  # no split needed — one reduce over all blocks
        return rd.from_arrow_refs([reduce.remote(reduce_fn, *blocks)])
    split = _cached_remote(_exchange_split, num_returns=num_buckets)
    outs = [split.remote(b, key, num_buckets, seed, codec) for b in blocks]
    parts = [
        reduce.remote(reduce_fn, *[o[p] for o in outs])
        for p in range(num_buckets)
    ]
    return rd.from_arrow_refs(parts)


def _parquet_read_table(files, columns):
    import pyarrow.parquet as pq

    return pa.concat_tables(
        [pq.read_table(f, columns=columns) for f in files])


def _parquet_split(files, columns, key: str, num_buckets: int, seed: int,
                   codec: str | None = None):
    """Fused read+split task: decode parquet file(s) directly into the
    exchange's bucket slices — the read job's output never round-trips
    the object store as whole blocks."""
    return _exchange_split(
        _parquet_read_table(files, columns), key, num_buckets, seed, codec)


def hash_exchange_parquet(path: str, columns, key: str,
                          num_buckets: int | None, reduce_fn,
                          seed: int = _HASH_SEED, arrow: bool = False,
                          target_bucket_bytes: int = TARGET_BUCKET_BYTES,
                          files_per_task: int = 1,
                          codec: str | None = None):
    """``hash_exchange`` whose input is a parquet file/directory read
    INSIDE the split tasks (one task per ``files_per_task`` files).

    vs ``hash_exchange(read_parquet(path))``: the materialize barrier's
    full plasma write+read of the decoded input (~GBs at the scaling
    corpus) and one Ray-Data job startup disappear — both cpu-count
    -constant terms in the scaling-efficiency gap. Bucket auto-sizing
    uses the files' UNCOMPRESSED row-group byte totals from the parquet
    footers (metadata only, no data read). Trade-off: no lineage-based
    retry of the read (task retry re-reads the file, same result) and no
    streaming backpressure — acceptable because the exchange barrier
    materializes everything anyway."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    size = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        size += sum(md.row_group(i).total_byte_size
                    for i in range(md.num_row_groups))
    by_mem = -(-size // max(1, target_bucket_bytes))
    if num_buckets is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        num_buckets = int(min(1024, max(ncpu, by_mem, 1)))
    elif by_mem > num_buckets:
        # same memory rule as hash_exchange: config is a parallelism
        # hint, bucket-fits-a-worker is the contract
        num_buckets = int(min(1024, by_mem))
    groups = [files[i:i + files_per_task]
              for i in range(0, len(files), files_per_task)]
    reduce = _cached_remote(
        _exchange_reduce_arrow if arrow else _exchange_reduce)
    if num_buckets == 1:  # no split needed — one reduce over all reads
        rt = _cached_remote(_parquet_read_table)
        blocks = [rt.remote(g, list(columns)) for g in groups]
        return rd.from_arrow_refs([reduce.remote(reduce_fn, *blocks)])
    split = _cached_remote(_parquet_split, num_returns=num_buckets)
    outs = [split.remote(g, list(columns), key, num_buckets, seed, codec)
            for g in groups]
    parts = [
        reduce.remote(reduce_fn, *[o[p] for o in outs])
        for p in range(num_buckets)
    ]
    return rd.from_arrow_refs(parts)


def _semi_reduce(on: str, anti: bool, n_left: int, *tables):
    """One bucket's semi/anti filter: tables[:n_left] are left slices,
    the rest are right key slices (single column ``on``)."""
    import pyarrow.compute as pc

    left_tabs, right_tabs = tables[:n_left], tables[n_left:]
    live = [t for t in left_tabs if t.num_rows]
    if not live:
        return left_tabs[0].slice(0, 0)
    cols = live[0].schema.names
    lt = pa.concat_tables(t.select(cols) for t in live)
    live_r = [t for t in right_tabs if t.num_rows]
    if not live_r:
        return lt if anti else lt.slice(0, 0)
    rk = pa.concat_tables(t.select([on]) for t in live_r)[on]
    mask = pc.is_in(lt[on], value_set=rk.combine_chunks().unique())
    if anti:
        mask = pc.invert(mask)
    return lt.filter(mask)


def bucketed_semi_join(left, right, *, on: str, right_on: str | None = None,
                       anti: bool = False, num_buckets: int | None = None,
                       seed: int = _HASH_SEED):
    """Distributed semi/anti join: both sides hash-split on the key, one
    reduce task per bucket filters its left slice by vectorized ``is_in``
    against the co-located right keys.

    The scale path for semi/anti when the build side's distinct key set is
    too large to gather driver-side (VERDICT r3 'what's wrong' #2): only
    the right KEY COLUMN moves through the exchange, and the driver never
    sees a row. Bucket count auto-sizes from left bytes (the memory rule).
    """
    import ray.data as rd
    from ray.data.dataset import MaterializedDataset

    right_keys = right.select_columns([right_on or on])
    if right_on and right_on != on:
        right_keys = right_keys.rename_columns({right_on: on})

    lmat = left if isinstance(left, MaterializedDataset) else left.materialize()
    rmat = right_keys.materialize()
    if num_buckets is None:
        num_buckets = _auto_buckets(lmat)
    lblocks = list(lmat.to_arrow_refs())
    rblocks = list(rmat.to_arrow_refs())
    if not lblocks:
        return lmat
    reduce = _cached_remote(_semi_reduce)
    if num_buckets == 1:  # num_returns=1 yields a bare ref, not a tuple
        return rd.from_arrow_refs(
            [reduce.remote(on, anti, len(lblocks), *lblocks, *rblocks)])
    split = _cached_remote(_exchange_split, num_returns=num_buckets)
    louts = [split.remote(b, on, num_buckets, seed) for b in lblocks]
    routs = [split.remote(b, on, num_buckets, seed) for b in rblocks]
    parts = [
        reduce.remote(on, anti, len(louts),
                      *[o[p] for o in louts], *[o[p] for o in routs])
        for p in range(num_buckets)
    ]
    return rd.from_arrow_refs(parts)


_REMOTE_CACHE: dict = {}


def _cached_remote(fn, **opts):
    """Wrap ``fn`` with ``ray.remote`` ONCE per (fn, opts): re-wrapping per
    call re-registers and re-exports the function for every exchange
    stage, which adds per-stage latency and defeats worker-side caching."""
    import ray

    key = (fn, tuple(sorted(opts.items())))
    if key not in _REMOTE_CACHE:
        _REMOTE_CACHE[key] = ray.remote(num_cpus=1, **opts)(fn)
    return _REMOTE_CACHE[key]


def bucketed_group_map(
    ds,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None,
    seed: int = _HASH_SEED,
):
    """Hash-partitioned group apply: one vectorized pandas call per BUCKET.

    ``groupby(key).map_groups`` costs one Python call per group — with
    millions of small groups (conversations, blocks) that dominates wall
    time. Instead ``fn`` handles all groups of a hash bucket with a single
    vectorized ``df.groupby`` — the scalable pattern for the reference's
    per-cluster loops (build_ali_dataset.py:60-130).

    The exchange is a custom raw-Ray-task map/reduce — one split task per
    input block emitting ``num_buckets`` zero-copy slices, one reduce task
    per bucket — NOT ``Dataset.groupby``: Ray 2.49's sort-based shuffle
    VALUE-SORTS the whole payload to co-locate a 64-value bucket key
    (measured 2-3× slower end-to-end on the 120k-cluster assemble), and
    its hash-shuffle strategy stalls on this workload. Partitioning is all
    the semantics need; every ``fn`` re-orders within its bucket. The
    input materializes at the exchange boundary (the round-1 barrier rule
    for all-to-all ops); lineage-based task retry still applies.

    ``fn`` receives the bucket DataFrame and must return a DataFrame.
    """
    return hash_exchange(ds, key, num_buckets, fn, seed=seed, arrow=False)


def compact_nonempty(ds):
    """Materialize and drop 0-row blocks (zero-copy block-ref reshuffle).

    Works around a Ray 2.49 hash-shuffle issue: `_shuffle_block` returns
    early for a 0-row input block BEFORE the one-shot schema broadcast to
    aggregators (`hash_shuffle.py:223` vs `_has_schemas_broadcasted`), so a
    downstream `Dataset.join` whose input starts with an empty block can
    fail with "No match ... for key field on left side". Join inputs in
    this engine pass through here first.
    """
    import ray
    import ray.data as rd

    mat = ds if hasattr(ds, "iter_internal_ref_bundles") else ds
    mat = mat.materialize()
    refs = []
    n_empty = 0
    for rb in mat.iter_internal_ref_bundles():
        for block_ref, meta in rb.blocks:
            if meta.num_rows:
                refs.append(block_ref)
            else:
                n_empty += 1
    if not n_empty:
        return mat
    if not refs:
        return mat  # fully empty; callers must special-case before joining
    return rd.from_arrow_refs(refs)


def hash_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int = 32,
):
    """Hash-partitioned ``Dataset.join`` with empty-block/empty-input
    handling (see compact_nonempty). Column names must be disjoint apart
    from the keys (call sites rename beforehand)."""
    import pyarrow as pa
    import ray.data as rd

    right_on = right_on or on
    lc = compact_nonempty(left)
    rc = compact_nonempty(right)
    ln, rn = lc.count(), rc.count()
    if ln == 0 or (rn == 0 and how == "inner"):
        lschema = lc.schema()
        rschema = rc.schema()
        fields = list(zip(lschema.names, lschema.types))
        fields += [
            (n, t)
            for n, t in zip(rschema.names, rschema.types)
            if n != right_on
        ]
        empty = pa.Table.from_pylist([], schema=pa.schema(fields))
        return rd.from_arrow(empty)
    if rn == 0 and how == "left_outer":
        rschema = rc.schema()
        extra = [(n, t) for n, t in zip(rschema.names, rschema.types) if n != right_on]

        def add_nulls(batch: pa.Table) -> pa.Table:
            for n, t in extra:
                batch = batch.append_column(n, pa.nulls(batch.num_rows, t))
            return batch

        return lc.map_batches(add_nulls, batch_format="pyarrow")
    return lc.join(
        rc,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on != on else None,
    )


def canonical_pairs(left: np.ndarray, right: np.ndarray):
    """Order pair endpoints so left < right (U2 canonical ordering,
    build_ali_dataset.py:85-87 self/symmetric pair removal)."""
    swap = left > right
    lo = np.where(swap, right, left)
    hi = np.where(swap, left, right)
    keep = lo != hi
    return lo[keep], hi[keep]


def bucketed_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_buckets: int | None = 64,
    seed: int = _HASH_SEED,
    post=None,
):
    """Single-shuffle hash join: side-tag + pad both inputs to a common
    schema, union, shuffle once on ``hash(key) % num_buckets``, and merge
    each bucket with one vectorized pandas ``merge``.

    ``post``: optional table→table callable applied to each joined bucket
    INSIDE the reduce task — the fused-consumer hook. When the join's
    per-row output is wide but its consumer reduces it (e.g. pair-side
    payload attach → scoring), fusing the consumer here means only the
    reduced rows ever enter the object store instead of the full joined
    table. ``post`` must handle an empty input table (empty buckets pass
    through it so every part shares the post-schema).

    Rationale vs ``Dataset.join``: Ray 2.49's join needs the
    empty-block workaround (``compact_nonempty`` = one extra materialize +
    count per side). On the ER hot path (pair-side attach, per-round CC
    message join, eval attach ×4) those fixed costs dominate small/medium
    runs; this variant is one all-to-all exchange with no driver barrier,
    and at scale it shuffles the same bytes a hash join would.

    ``how``: "inner", "left_outer" or "full_outer" (key coalesced across
    sides in the outer forms). Key column names must not collide
    with payload names; payload names must be disjoint across sides.
    """
    import pyarrow as pa
    import ray.data as rd

    right_on = right_on or on
    if right_on != on:
        right = right.rename_columns({right_on: on})

    lschema, rschema = left.schema(), right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    if ltypes[on] != rtypes[on]:
        raise ValueError(f"key type mismatch on {on!r}")
    lpay = [n for n in lschema.names if n != on]
    rpay = [n for n in rschema.names if n != on]
    dup = set(lpay) & set(rpay)
    if dup:
        raise ValueError(f"payload name collision: {sorted(dup)}")
    all_cols = [on, *lpay, *rpay]
    types = {**rtypes, **ltypes}

    def pad(side_id: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for c in all_cols:
                cols[c] = (
                    batch[c] if c in batch.schema.names else pa.nulls(n, types[c])
                )
            cols["__side"] = pa.array(np.full(n, side_id, np.int8))
            return pa.table(cols)

        return fn

    lt = left.map_batches(pad(0), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(pad(1), batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    out_schema = pa.schema(
        [(on, types[on])]
        + [(c, types[c]) for c in lpay]
        + [(c, types[c]) for c in rpay]
    )
    pd_how = {"inner": "inner", "left_outer": "left",
              "full_outer": "outer"}[how]
    acero_how = {"inner": "inner", "left_outer": "left outer",
                 "full_outer": "full outer"}[how]
    # pandas merge silently corrupts integer payloads once the null
    # padding forces a float64 round-trip (uint64 fingerprints lose low
    # bits above 2^53) — so the per-bucket merge runs in Arrow (Acero
    # join, types preserved) and falls back to pandas ONLY for payloads
    # Acero can't carry (list/nested columns, e.g. embeddings)
    nested_payload = any(
        pa.types.is_nested(types[c]) for c in (*lpay, *rpay)
    )

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if tbl.num_rows == 0 or "__side" not in tbl.schema.names:
            # Ray map_batches passes EMPTY input blocks through without
            # running the pad fn, so a fully-empty bucket can arrive with
            # the PRE-pad schema (no __side) — seen when the right side
            # has empty blocks (tiny vocab over many buckets)
            empty = out_schema.empty_table()
            return post(empty) if post is not None else empty
        mask = pc.equal(tbl["__side"], 0)
        l = tbl.filter(mask).select([on, *lpay])
        r = tbl.filter(pc.invert(mask)).select([on, *rpay])
        if nested_payload:
            out = l.to_pandas().merge(r.to_pandas(), on=on, how=pd_how)
            joined = pa.Table.from_pandas(out, schema=out_schema,
                                          preserve_index=False)
        else:
            joined = l.join(r, keys=on, join_type=acero_how)
            joined = joined.select(out_schema.names).cast(out_schema)
        return post(joined) if post is not None else joined

    return hash_exchange(both, on, num_buckets, merge_bucket, seed=seed,
                         arrow=True)


def flatten_chunked(col):
    """ChunkedArray → single Array, avoiding pyarrow 14's pathological
    list-column ``combine_chunks`` (~30s for 10^6 rows of list<string>;
    the manual values-concat + offsets-rebuild below is ~0.6s). Chunked
    TAKE is just as bad (~60× slower than flat), so broadcast indexes
    must hold flat arrays."""
    if isinstance(col, pa.Array):
        return col
    if col.num_chunks == 1:
        return col.chunk(0)
    t = col.type
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and col.null_count == 0:
        import pyarrow.compute as pc

        lens = [np.asarray(pc.list_value_length(ch)) for ch in col.chunks]
        offsets = np.concatenate([[0], np.cumsum(np.concatenate(lens))])
        values = pa.concat_arrays([ch.flatten() for ch in col.chunks])
        off_t = pa.int64() if pa.types.is_large_list(t) else pa.int32()
        cls = pa.LargeListArray if pa.types.is_large_list(t) else pa.ListArray
        return cls.from_arrays(pa.array(offsets, off_t), values)
    return col.combine_chunks()


def _index_shard_build(key, columns, prepare_fn, *tables):
    """Shard task: concat this shard's slices (one per source block),
    apply ``prepare_fn`` (e.g. slice payloads to what consumers actually
    read), build a broadcast index over them."""
    live = [t for t in tables if t.num_rows]
    if not live:
        live = list(tables[:1])
    cols = [key, *columns]
    tbl = pa.concat_tables(t.select(cols) for t in live)
    if prepare_fn is not None:
        tbl = prepare_fn(tbl)
    return build_broadcast_index(tbl, key, columns)


def build_sharded_index_async(ds, key: str, columns, num_shards: int = 16,
                              seed: int = _HASH_SEED, prepare_fn=None):
    """Parallel broadcast-index build: split each materialized block by
    ``hash(key) % num_shards`` (the exchange splitter), then one build
    task per shard. Returns a list of ObjectRefs (one index per shard) for
    ``sharded_lookup`` — a single build task was ~40s single-threaded at
    the 1.8M-row/3GB scale and sat on the critical path as soon as the
    overlap window closed."""
    import ray
    from ray.data.dataset import MaterializedDataset

    mat = ds if isinstance(ds, MaterializedDataset) else ds.materialize()
    blocks = list(mat.to_arrow_refs())
    split = _cached_remote(_exchange_split, num_returns=num_shards)
    build = _cached_remote(_index_shard_build)
    outs = [split.remote(b, key, num_shards, seed) for b in blocks]
    return [
        build.remote(key, list(columns), prepare_fn, *[o[s] for o in outs])
        for s in range(num_shards)
    ]


def touch_pages(shard_indexes) -> int:
    """Fault in every page of a (sharded) broadcast index's plasma-mapped
    buffers: one strided byte-read per 4 KiB page, numpy arrays and Arrow
    buffers alike. Zero-copy ``ray.get`` maps the object store memory
    lazily — the first random-access lookup otherwise pays the whole
    index's soft page faults on the consumer's critical path (measured
    ~9-10 s per scorer actor at a ~GB index). Call from actor ``__init__``
    so the faults land in the overlap window. Returns bytes touched."""
    total = 0
    sink = 0
    for shard in shard_indexes:
        for v in shard.values():
            if isinstance(v, np.ndarray):
                if v.nbytes and v.data.contiguous:
                    b = v.reshape(-1).view(np.uint8)
                    sink += int(b[::4096].sum())
                    total += v.nbytes
            elif isinstance(v, (pa.Array, pa.ChunkedArray)):
                chunks = v.chunks if isinstance(v, pa.ChunkedArray) else [v]
                for c in chunks:
                    for buf in c.buffers():
                        if buf is not None and buf.size:
                            b = np.frombuffer(buf, np.uint8)
                            sink += int(b[::4096].sum())
                            total += buf.size
    return total if sink >= 0 else -1  # keep the reads live


def sharded_lookup(shard_indexes, query: pa.Array, column: str,
                   seed: int = _HASH_SEED) -> pa.Array:
    """Vectorized lookup across shard indexes (from
    ``build_sharded_index_async``): route each query key to its shard,
    look up per shard on the hash-contiguous slices, restore input order.
    """
    if isinstance(query, pa.ChunkedArray):
        query = query.combine_chunks()
    S = len(shard_indexes)
    qb = bucket_of(query, S, seed)
    order = np.argsort(qb, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    q_sorted = query.take(pa.array(order))
    bounds = np.searchsorted(qb[order], np.arange(S + 1))
    parts = []
    for s in range(S):
        n = bounds[s + 1] - bounds[s]
        if n == 0:
            continue
        parts.append(
            broadcast_lookup(shard_indexes[s],
                             q_sorted.slice(bounds[s], n), column)
        )
    if not parts:
        return pa.nulls(0, shard_indexes[0][column].type)
    vals = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts])
    return vals.take(pa.array(inv))


def hash_sharded_lookup(shard_indexes, qh: np.ndarray, column: str) -> pa.Array:
    """Lookup by PRECOMPUTED ``stable_hash64`` keys (uint64) across shard
    indexes from ``build_sharded_index_async``: shard routing (``hash % S``)
    and the per-shard ``__hash`` sort both derive from the same
    ``stable_hash64`` the exchange splitter used, so a hash query resolves
    without ever touching string keys. Pass ``column="__key"`` to recover
    the original key values. Exact despite skipping the string-equality
    verify: ``build_broadcast_index`` rejects distinct-key hash collisions
    at build time, so within an index hash equality IS key equality."""
    import pyarrow.compute as pc

    S = len(shard_indexes)
    qh = np.ascontiguousarray(qh, dtype=np.uint64)
    qb = (qh % np.uint64(S)).astype(np.int64)
    order = np.argsort(qb, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    qs = qh[order]
    bounds = np.searchsorted(qb[order], np.arange(S + 1))
    parts = []
    for s in range(S):
        n = bounds[s + 1] - bounds[s]
        if n == 0:
            continue
        idx = shard_indexes[s]
        sl = qs[bounds[s]:bounds[s + 1]]
        H = idx["__hash"]
        if len(H) == 0:
            parts.append(pa.nulls(int(n), idx[column].type))
            continue
        pos = np.searchsorted(H, sl)
        pos = np.clip(pos, 0, len(H) - 1)
        rows = pa.array(idx["__order"][pos])
        hit = pa.array(H[pos] == sl)
        vals = idx[column].take(rows)
        parts.append(pc.if_else(hit, vals, pa.nulls(int(n), vals.type)))
    if not parts:
        return pa.nulls(0, shard_indexes[0][column].type)
    vals = pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in parts])
    return vals.take(pa.array(inv))


def hash_sharded_lookup_multi(shard_indexes, qh: np.ndarray,
                              columns) -> dict:
    """``hash_sharded_lookup`` for several columns at once: the routing
    argsort + per-shard binary search run ONCE and every column reuses the
    resolved row indices (the searches were the per-column fixed cost)."""
    import pyarrow.compute as pc

    S = len(shard_indexes)
    qh = np.ascontiguousarray(qh, dtype=np.uint64)
    qb = (qh % np.uint64(S)).astype(np.int64)
    order = np.argsort(qb, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    qs = qh[order]
    bounds = np.searchsorted(qb[order], np.arange(S + 1))
    parts: dict = {c: [] for c in columns}
    for s in range(S):
        n = bounds[s + 1] - bounds[s]
        if n == 0:
            continue
        idx = shard_indexes[s]
        sl = qs[bounds[s]:bounds[s + 1]]
        H = idx["__hash"]
        if len(H) == 0:
            for c in columns:
                parts[c].append(pa.nulls(int(n), idx[c].type))
            continue
        pos = np.searchsorted(H, sl)
        pos = np.clip(pos, 0, len(H) - 1)
        rows = pa.array(idx["__order"][pos])
        hit = pa.array(H[pos] == sl)
        miss = not np.asarray(hit).all()
        for c in columns:
            vals = idx[c].take(rows)
            parts[c].append(
                pc.if_else(hit, vals, pa.nulls(int(n), vals.type))
                if miss else vals)
    out = {}
    inv_a = pa.array(inv)
    for c in columns:
        if not parts[c]:
            out[c] = pa.nulls(0, shard_indexes[0][c].type)
            continue
        vals = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in parts[c]])
        out[c] = vals.take(inv_a)
    return out


def build_broadcast_index(table, key: str, columns: list[str]):
    """Build a zero-copy-broadcastable lookup index from a (small-side)
    pandas DataFrame or Arrow table: rows sorted by ``stable_hash64(key)``.

    Store the result with ``ray.put`` and resolve per batch with
    ``broadcast_lookup`` — the payload is numpy-numeric + Arrow arrays, so
    workers read it zero-copy from the object store (a python dict of the
    same size costs a full unpickle PER TASK, which serialises the whole
    stage at scale — measured as the dominant cost of eval/attach on a
    450k-conversation corpus).
    """
    if isinstance(table, pd.DataFrame):
        table = pa.Table.from_pandas(table, preserve_index=False)
    keys = flatten_chunked(table[key])
    h = stable_hash64(keys)
    order = np.argsort(h, kind="stable")
    # distinct keys colliding on the 64-bit hash would make hash-keyed
    # resolution (hash_sharded_lookup) silently wrong — fail at build.
    # Expected never: ~n²/2^65 odds; adjacent-dup scan is O(n)
    hs = h[order]
    dup = np.flatnonzero(hs[1:] == hs[:-1])
    if len(dup):
        import pyarrow.compute as pc

        ka = keys.take(pa.array(order[dup]))
        kb = keys.take(pa.array(order[dup + 1]))
        if not pc.all(pc.equal(ka, kb)).as_py():
            raise ValueError(
                "build_broadcast_index: stable_hash64 collision between "
                f"distinct {key!r} keys — hash-keyed lookups would be wrong")
    # payload columns stay UNSORTED but FLAT, with an order permutation:
    # lookups are random access either way, so sorting the payloads was a
    # pointless full-table take; and they must be flat because chunked
    # take is ~60× slower per lookup batch (see flatten_chunked)
    idx = {"__hash": h[order], "__order": order, "__key": keys}
    for c in columns:
        idx[c] = flatten_chunked(table[c])
    return idx


def broadcast_lookup(index, query: pa.Array, column: str) -> pa.Array:
    """Vectorized lookup of ``query`` keys in a ``build_broadcast_index``
    result → values array (null where the key is absent).

    Hash-searchsorted + exact key verification: a hash collision can only
    turn a present key into a (vanishingly rare, ~2^-64·n) null, never a
    wrong value.
    """
    import pyarrow.compute as pc

    if isinstance(query, pa.ChunkedArray):
        query = query.combine_chunks()
    if len(index["__hash"]) == 0:
        return pa.nulls(len(query), index[column].type)
    qh = stable_hash64(query)
    pos = np.searchsorted(index["__hash"], qh)
    pos = np.clip(pos, 0, max(0, len(index["__hash"]) - 1))
    rows = pa.array(index["__order"][pos])  # permute into the unsorted table
    hit = pc.and_(
        pa.array(index["__hash"][pos] == qh),
        pc.equal(index["__key"].take(rows), query),
    )
    vals = index[column].take(rows)
    return pc.if_else(hit, vals, pa.nulls(len(query), vals.type))


def dataset_to_arrow(ds) -> pa.Table:
    """Materialized Dataset → one driver-side Arrow table WITHOUT a pandas
    round-trip: zero-copy block gather + column-order alignment (block
    schemas can disagree on column ORDER after map stages) + concat."""
    import ray

    tables = [t for t in ray.get(list(ds.to_arrow_refs())) if t.num_rows]
    if not tables:
        # ds.schema() is Ray's Schema wrapper (no empty_table); build the
        # empty Arrow table from its names/types so callers keep columns
        sch = ds.schema()
        if sch is None:
            return pa.table({})
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base.empty_table()
        return pa.Table.from_pylist(
            [], schema=pa.schema(list(zip(sch.names, sch.types))))
    cols = tables[0].schema.names
    return pa.concat_tables(t.select(cols) for t in tables).combine_chunks()
