"""Candidate pair generation from blocks, with skew cap + cross-block dedup.

Reference analog: per-cluster / per-block cross joins with self-pair
removal and anti-join dedup (``build_ali_dataset.py:80-97,158-183``,
J1/J2/J3/U2) — re-expressed as two hash shuffles:

  1. ``groupby(bucket(block_key))`` → per block, emit all unordered pairs
     ``conv_id_left < conv_id_right`` (canonical ordering replaces the
     reference's in-memory anti-join, SURVEY.md §7.3).
  2. ``groupby(bucket(conv_id_left))`` → vectorized ``drop_duplicates`` —
     identical pairs produced by different LSH bands collapse (they share
     ``conv_id_left`` so they co-locate; no global set needed).

Skew: a block whose size exceeds ``max_block_size`` is dropped as a
stop-key — the analog of the reference's fan-out cap
(SIMILAR_CLUSTER_NUM=12, ``build_ali_dataset.py:36``): an LSH band shared
by thousands of records carries no discriminative signal but would cost
O(size²) pairs. With b bands per record, true near-duplicates still meet
in other, rarer bands. Every oversize event (either policy) is counted to
the ``state.stats`` side-channel actor — a mis-tuned cap at scale is
observable, never a silent candidate loss (VERDICT r3 #4); ``run_er``
snapshots the counters into its result dict.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bucketed_group_map


def generate_pairs(
    blocks,
    max_block_size: int = 64,
    num_buckets: int = 64,
    on_oversize: str = "drop",
):
    """BLOCKS dataset → CANDIDATE_PAIRS dataset (deduped, left<right).

    ``on_oversize`` controls the skew policy for blocks above
    ``max_block_size``:
      * ``"drop"`` (default): treat the key as a stop-key — an LSH band
        shared by thousands of records carries no discriminative signal
        but would cost O(n²) pairs; true near-dups still meet in rarer
        bands (the reference's SIMILAR_CLUSTER_NUM=12 fan-out cap analog).
      * ``"salt"``: deterministically split the block's members into
        ⌈n/max⌉ salted sub-blocks (``stable_hash(conv_id) % k``) and pair
        within each — bounds cost at O(n·max) while keeping signal from
        hot keys; the salt is content-derived, so identical across runs
        and cluster sizes (the salted, skew-aware shuffle of the north
        star).
    """
    from ..util import bucket_of

    if blocks.schema() is not None and "cid" in blocks.schema().names:
        return _generate_pairs_hashed(blocks, max_block_size, num_buckets,
                                      on_oversize)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized dedup+sort per bucket; per-group work batched by
        # SIZE CLASS (≤ max_block_size iterations), not per group — a
        # bucket holds ~10^5 tiny band groups and a python loop over them
        # dominated this stage's wall time
        df = df.drop_duplicates(["block_key", "conv_id"]).sort_values(
            ["block_key", "conv_id"], kind="mergesort")
        keys = df["block_key"].to_numpy()
        ids_all = df["conv_id"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        sizes = np.diff(bounds)
        starts = bounds[:-1]
        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []

        def emit(ids: np.ndarray):
            i, j = np.triu_indices(ids.size, k=1)
            out_l.append(ids[i])
            out_r.append(ids[j])

        ok = (sizes >= 2) & (sizes <= max_block_size)
        for s in np.unique(sizes[ok]):
            gs = starts[ok & (sizes == s)]
            # ids are sorted within each group (the bucket sort above), so
            # triu i<j yields canonical left<right directly
            mat = ids_all[gs[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(s, k=1)
            out_l.append(mat[:, iu].ravel())
            out_r.append(mat[:, ju].ravel())

        # oversize (hot-key) groups are few — python loop is fine here
        over = sizes > max_block_size
        if over.any():
            from ..state.stats import report_oversize

            report_oversize("er_pairs", int(over.sum()),
                            int(sizes[over].sum()), on_oversize)
        for s, e in zip(starts[over], bounds[1:][over]):
            ids = ids_all[s:e]
            if on_oversize == "drop":
                continue
            k = -(-ids.size // max_block_size)
            salt = bucket_of(ids, k)
            for sub_id in range(k):
                sub = ids[salt == sub_id]
                if sub.size >= 2:
                    emit(sub)
        if not out_l:
            return pd.DataFrame(
                {"conv_id_left": pd.array([], "str"), "conv_id_right": pd.array([], "str")}
            )
        # local combiner: different bands of the same pair often land in
        # the same bucket — dedup before shuffle #2 to cut its volume
        return pd.DataFrame(
            {
                "conv_id_left": np.concatenate(out_l),
                "conv_id_right": np.concatenate(out_r),
            }
        ).drop_duplicates(["conv_id_left", "conv_id_right"])

    # barrier between the two shuffles: chained lazily, Ray 2.49 overlaps
    # their aggregators and the pair stays ~20% slower (cf. er.compute_pairs)
    paired = bucketed_group_map(
        blocks, key="block_key", fn=pairs_in_bucket, num_buckets=num_buckets
    ).materialize()

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["conv_id_left", "conv_id_right"])

    return bucketed_group_map(
        paired, key="conv_id_left", fn=dedup_bucket, num_buckets=num_buckets
    )


def _dedup_hash_pairs(hl: np.ndarray, hr: np.ndarray):
    """Exact (hl, hr) dedup: numeric lexsort + adjacent equality on BOTH
    columns (never a mixed single key — a mix collision would DROP a
    genuine pair)."""
    if not len(hl):
        return hl, hr
    o = np.lexsort((hr, hl))
    hl, hr = hl[o], hr[o]
    d = (hl[1:] == hl[:-1]) & (hr[1:] == hr[:-1])
    keep = np.r_[True, ~d]
    return hl[keep], hr[keep]


_EMPTY_HASH_PAIRS = pa.table(
    {"hl": pa.array([], pa.uint64()), "hr": pa.array([], pa.uint64())})


def _generate_pairs_hashed(blocks, max_block_size, num_buckets, on_oversize):
    """The uint64 pair path (blocks carry ``cid = stable_hash64(conv_id)``,
    see ``make_blocks(hashed=True)``): both exchanges and every dedup sort
    run on 16 B/pair numeric keys — per-bucket working sets drop ~3× vs
    string pairs, below the box's measured ~L3-share knee where
    bandwidth-bound sorts stop scaling (BASELINE.md round-3 probe).
    Canonical internal order is NUMERIC ``hl < hr``; the scorer restores
    lexicographic ``conv_id_left < conv_id_right`` after resolving strings
    (all pair features are symmetric, so orientation never changes
    values). Sub-block salt is ``cid % k`` — identical members per
    sub-block as the string path's ``bucket_of(conv_id, k)``, because
    ``cid`` IS ``stable_hash64(conv_id)``."""
    from ..util import hash_exchange

    def pairs_in_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _EMPTY_HASH_PAIRS
        bk = tbl["block_key"].to_numpy(zero_copy_only=False)
        cid = tbl["cid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cid, bk))
        bk, cid = bk[order], cid[order]
        dup = (bk[1:] == bk[:-1]) & (cid[1:] == cid[:-1])
        keep = np.r_[True, ~dup]
        bk, cid = bk[keep], cid[keep]
        bounds = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1], True])
        sizes = np.diff(bounds)
        starts = bounds[:-1]
        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        ok = (sizes >= 2) & (sizes <= max_block_size)
        for s in np.unique(sizes[ok]):
            gs = starts[ok & (sizes == s)]
            # cid ascending within each group (the lexsort) → triu i<j
            # yields canonical hl<hr directly
            mat = cid[gs[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(s, k=1)
            out_l.append(mat[:, iu].ravel())
            out_r.append(mat[:, ju].ravel())
        over = sizes > max_block_size
        if over.any():
            from ..state.stats import report_oversize

            report_oversize("er_pairs", int(over.sum()),
                            int(sizes[over].sum()), on_oversize)
        for s, e in zip(starts[over], bounds[1:][over]):
            if on_oversize == "drop":
                continue
            ids = cid[s:e]
            k = -(-ids.size // max_block_size)
            salt = (ids % np.uint64(k)).astype(np.int64)
            for sub_id in range(k):
                sub = ids[salt == sub_id]
                if sub.size >= 2:
                    i, j = np.triu_indices(sub.size, k=1)
                    out_l.append(sub[i])
                    out_r.append(sub[j])
        if not out_l:
            return _EMPTY_HASH_PAIRS
        hl, hr = _dedup_hash_pairs(np.concatenate(out_l),
                                   np.concatenate(out_r))
        return pa.table({"hl": pa.array(hl, pa.uint64()),
                         "hr": pa.array(hr, pa.uint64())})

    paired = hash_exchange(blocks, key="block_key", num_buckets=num_buckets,
                           reduce_fn=pairs_in_bucket, arrow=True).materialize()

    def dedup_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _EMPTY_HASH_PAIRS
        hl = tbl["hl"].to_numpy(zero_copy_only=False)
        hr = tbl["hr"].to_numpy(zero_copy_only=False)
        hl, hr = _dedup_hash_pairs(hl, hr)
        return pa.table({"hl": pa.array(hl, pa.uint64()),
                         "hr": pa.array(hr, pa.uint64())})

    return hash_exchange(paired, key="hl", num_buckets=num_buckets,
                         reduce_fn=dedup_bucket, arrow=True)


def build_side_index_async(conversations, columns=("text",),
                           num_shards: int = 8, prepare_fn=None):
    """Launch the attach-side broadcast-index build as SHARDED background
    Ray tasks over the materialized conversation blocks; returns a list of
    ObjectRefs (one per hash shard) for ``util.sharded_lookup``. Call as
    soon as conversations materialize so the build overlaps blocking and
    pair-gen; sharding keeps the build parallel (a single build task was
    ~40s at 1.8M conversations and re-serialized the pipeline).

    ``prepare_fn(tbl) -> tbl`` runs inside each shard build task — e.g.
    slicing ``text`` to the scorer's MAX_SIM_CHARS prefix so the index
    stores only the bytes the scorer reads."""
    from ..util import build_sharded_index_async

    return build_sharded_index_async(conversations, "conv_id", list(columns),
                                     num_shards=num_shards,
                                     prepare_fn=prepare_fn)


def sim_prefix_prepare(tbl: pa.Table) -> pa.Table:
    """Index-build prepare hook: keep only the MAX_SIM_CHARS text prefix —
    JW/Levenshtein read nothing past it, and the full transcript text
    (~900 B avg at the scaling corpus) would otherwise dominate the
    broadcast index bytes ~7×."""
    import pyarrow.compute as pc

    from ..functions.similarity import MAX_SIM_CHARS

    i = tbl.schema.get_field_index("text")
    return tbl.set_column(
        i, "text", pc.utf8_slice_codeunits(tbl["text"], 0, MAX_SIM_CHARS))


def pack_hash_list(col, dtype) -> pa.Array:
    """list<int> column → flat ``binary`` column carrying the same bytes
    (value i = the little-endian ``dtype`` words of row i's list).

    Why: the giant-corpus attach joins per-bucket in Arrow Acero, which
    cannot carry nested types — shipping ``thash``/``ttf`` as binary lets
    the join path move the prehashed token payload (~8 B/token) instead
    of full conversation text (~900 B avg), the same compaction the
    broadcast index already does. Encoded from the exact
    ``hash_list_arrays`` (values, offsets) convention the scorer kernels
    consume, so ``unpack_hash_bin`` round-trips bit-exactly."""
    import numpy as np

    from ..functions.minhash import hash_list_arrays

    vals, off = hash_list_arrays(col, dtype=dtype)
    width = np.dtype(dtype).itemsize
    boff = (off * width).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(off) - 1,
        [None, pa.py_buffer(boff.tobytes()), pa.py_buffer(vals.tobytes())])


def unpack_hash_bin(col, dtype):
    """Inverse of :func:`pack_hash_list`: binary column → (flat values as
    ``dtype``, int64 element offsets) — the ``hash_list_arrays`` shape the
    prehashed scorer kernels take. Handles sliced arrays (exchange bucket
    slices carry an array offset) by windowing the offsets buffer; the
    data buffer stays whole, offsets are absolute into it."""
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        raise ValueError("packed hash column must be non-null")
    width = np.dtype(dtype).itemsize
    if len(arr) == 0:  # empty arrays may carry no buffers at all
        return np.empty(0, dtype), np.zeros(1, np.int64)
    bufs = arr.buffers()
    boff = np.frombuffer(bufs[1], np.int32)[arr.offset:arr.offset + len(arr) + 1]
    vals = (np.frombuffer(bufs[2], dtype=dtype)
            if bufs[2] is not None else np.empty(0, dtype))
    return vals, (boff // width).astype(np.int64)


def attach_sides(pairs, conversations, num_partitions: int = 32,
                 columns: tuple[str, ...] = ("text",),
                 broadcast_threshold: int = 1_000_000,
                 prebuilt_index_ref=None, post=None):
    """Join conversation payloads onto both pair sides.

    Hybrid (the small-side rule): when the conversation payload table fits
    on the driver (≤ ``broadcast_threshold`` rows) it is broadcast once via
    ``ray.put`` and attached map-side — zero shuffles; otherwise two
    hash-partitioned bucketed joins (SURVEY.md §7.2 shuffle table). At
    10^12-turn scale the join path always runs.

    ``prebuilt_index_ref``: list of shard ObjectRefs from
    ``build_side_index_async`` — skips any driver-side gather (the sharded
    build overlapped the upstream shuffle).

    ``post``: optional table→table consumer fused into the final attach
    step (the ``bucketed_join(post=...)`` hook on the join path, a lazy
    map elsewhere) — with a scorer here the per-pair side payloads never
    materialize in the object store; only the reduced rows do.
    """
    from ..util import bucketed_join

    hashed = pairs.schema() is not None and "hl" in pairs.schema().names
    if hashed:
        return _attach_sides_hashed(pairs, conversations, num_partitions,
                                    columns, broadcast_threshold,
                                    prebuilt_index_ref, post=post)
    cols = ["conv_id", *columns]
    if prebuilt_index_ref is not None or conversations.count() <= broadcast_threshold:
        import ray

        from ..util import (broadcast_lookup, build_sharded_index_async,
                            sharded_lookup)

        refs = (
            prebuilt_index_ref
            if prebuilt_index_ref is not None
            else build_side_index_async(conversations, columns)
        )

        def attach(batch: pa.Table) -> pa.Table:
            idxs = [ray.get(r) for r in refs]  # zero-copy from object store
            out = {n: batch[n] for n in batch.schema.names}
            for c in columns:
                out[f"{c}_left"] = sharded_lookup(idxs, batch["conv_id_left"], c)
                out[f"{c}_right"] = sharded_lookup(idxs, batch["conv_id_right"], c)
            # pair keys come from the same table — a miss is a bug. Fail
            # loudly rather than silently diverge from the join path's
            # inner semantics (which would DROP such pairs).
            c0 = columns[0]
            if out[f"{c0}_left"].null_count or out[f"{c0}_right"].null_count:
                raise ValueError(
                    "attach_sides: pair references conv_ids absent from the "
                    "conversation table (broadcast path would emit nulls "
                    "where the join path drops rows)"
                )
            return pa.table(out)

        attached = pairs.map_batches(attach, batch_format="pyarrow",
                                     zero_copy_batch=True)
        if post is not None:
            attached = attached.map_batches(post, batch_format="pyarrow",
                                            zero_copy_batch=True)
        return attached

    left = conversations.select_columns(cols).rename_columns(
        {c: f"{c}_left" for c in cols}
    )
    right = conversations.select_columns(cols).rename_columns(
        {c: f"{c}_right" for c in cols}
    )
    out = bucketed_join(pairs, left, on="conv_id_left",
                        num_buckets=num_partitions)
    return bucketed_join(out, right, on="conv_id_right",
                         num_buckets=num_partitions, post=post)


def _attach_sides_hashed(pairs, conversations, num_partitions, columns,
                         broadcast_threshold, prebuilt_index_ref,
                         post=None):
    """attach_sides for uint64 hash pairs (``hl``/``hr``): resolve conv_id
    strings + payloads from the sharded index (broadcast path) or via two
    bucketed joins on a derived ``cid`` column (giant-corpus path), then
    restore lexicographic output orientation (features are symmetric, so
    only the id columns swap; payload columns stay with their own side —
    downstream kernels see the same unordered text pair either way)."""
    import pyarrow.compute as pc

    if prebuilt_index_ref is not None or conversations.count() <= broadcast_threshold:
        import ray

        from ..util import hash_sharded_lookup

        refs = (
            prebuilt_index_ref
            if prebuilt_index_ref is not None
            else build_side_index_async(conversations, columns)
        )

        def attach(batch: pa.Table) -> pa.Table:
            from ..util import hash_sharded_lookup_multi

            idxs = [ray.get(r) for r in refs]
            hl = batch["hl"].to_numpy(zero_copy_only=False)
            hr = batch["hr"].to_numpy(zero_copy_only=False)
            cols = ("__key", *columns)
            L = hash_sharded_lookup_multi(idxs, hl, cols)
            R = hash_sharded_lookup_multi(idxs, hr, cols)
            swap = pc.greater(L["__key"], R["__key"])
            out = {
                "conv_id_left": pc.if_else(swap, R["__key"], L["__key"]),
                "conv_id_right": pc.if_else(swap, L["__key"], R["__key"]),
            }
            for c in columns:
                out[f"{c}_left"] = L[c]
                out[f"{c}_right"] = R[c]
            c0 = columns[0]
            if out[f"{c0}_left"].null_count or out[f"{c0}_right"].null_count:
                raise ValueError(
                    "attach_sides: pair references conv_ids absent from "
                    "the conversation table"
                )
            return pa.table(out)

        attached = pairs.map_batches(attach, batch_format="pyarrow",
                                     zero_copy_batch=True)
        if post is not None:
            attached = attached.map_batches(post, batch_format="pyarrow",
                                            zero_copy_batch=True)
        return attached

    from ..util import bucketed_join, stable_hash64

    def add_cid(name):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                name, pa.array(stable_hash64(batch["conv_id"]), pa.uint64()))
        return fn

    cols = ["conv_id", *columns]
    left = conversations.select_columns(cols).map_batches(
        add_cid("hl"), batch_format="pyarrow", zero_copy_batch=True
    ).rename_columns({c: f"{c}_left" for c in cols})
    right = conversations.select_columns(cols).map_batches(
        add_cid("hr"), batch_format="pyarrow", zero_copy_batch=True
    ).rename_columns({c: f"{c}_right" for c in cols})
    out = bucketed_join(pairs, left, on="hl", num_buckets=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        l_id, r_id = batch["conv_id_left"], batch["conv_id_right"]
        if isinstance(l_id, pa.ChunkedArray):
            l_id = l_id.combine_chunks()
        if isinstance(r_id, pa.ChunkedArray):
            r_id = r_id.combine_chunks()
        swap = pc.greater(l_id, r_id)
        out = {
            "conv_id_left": pc.if_else(swap, r_id, l_id),
            "conv_id_right": pc.if_else(swap, l_id, r_id),
        }
        for c in columns:
            out[f"{c}_left"] = batch[f"{c}_left"]
            out[f"{c}_right"] = batch[f"{c}_right"]
        return pa.table(out)

    # with a fused consumer, finish + post run INSIDE the second join's
    # reduce task — the per-pair payload table never enters the store
    fin_post = (lambda t: post(finish(t))) if post is not None else None
    out = bucketed_join(out, right, on="hr", num_buckets=num_partitions,
                        post=fin_post)
    if fin_post is not None:
        return out
    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)
