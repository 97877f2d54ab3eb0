"""Pairwise scoring: candidate pairs + side payloads → scored pairs.

Reference analog: the matcher forward pass producing a positive-class
probability per pair (``src/models/matcher.py:26-42``, T2), replaced per
BASELINE.json north_star by batched Jaro-Winkler / Levenshtein /
token-Jaccard / TF-IDF-cosine similarity inside a ``map_batches`` actor
pool over zero-copy Arrow.

Actor-pool pattern (reference T1/T2/T5: tokenizer/model/vocab loaded once
per worker): ``PairScorer.__init__`` opens the DuckDB kernel connection and
fetches the broadcast IDF table (``ray.put`` once on the driver, ``ray.get``
once per actor — never re-shipped per batch); ``__call__`` scores one Arrow
batch fully vectorized.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..functions.minhash import token_hashes
from ..functions.similarity import (
    MAX_SIM_CHARS,
    StringSimKernel,
    encode_tokens_to_string,
    token_pair_scores,
)

DEFAULT_WEIGHTS = {"jaccard": 0.35, "jaro_winkler": 0.15, "levenshtein": 0.1,
                   "tfidf_cosine": 0.4}
IDF_NUM_FEATURES = 1 << 20


def _idf_partial_arrays(batch: pa.Table):
    """One block/batch → (unique tid, df) partial arrays (per-doc unique
    via one packed single-key sort — no per-doc loop). With a precomputed
    ``thash`` column (per-doc unique hashes) the sort is skipped entirely:
    the flat values mod the feature space ARE the per-doc tids — the same
    values the tokens path derives."""
    from ..functions.similarity import _packed_unique

    names = batch.schema.names if batch.num_rows else []
    if batch.num_rows and "thash" in names:
        from ..functions.minhash import hash_list_arrays

        h, _ = hash_list_arrays(batch["thash"])
        tid = (h % np.uint64(IDF_NUM_FEATURES)).astype(np.int64)
        return np.unique(tid, return_counts=True)
    if batch.num_rows == 0 or "tokens" not in batch.schema.names:
        # empty blocks can carry an empty schema (Ray 2.49 artifact)
        return np.empty(0, np.int64), np.empty(0, np.int64)
    h, offsets = token_hashes(batch["tokens"])
    offsets = np.asarray(offsets, np.int64)
    n = len(offsets) - 1
    tids = []
    for s in range(0, max(n, 1), 1 << 20):  # row-chunk: packing budget
        e = min(n, s + (1 << 20))
        if e <= s:
            break
        hh = h[offsets[s]:offsets[e]]
        _, _, first = _packed_unique(hh, offsets[s:e + 1] - offsets[s])
        tids.append((hh[first] % np.uint64(IDF_NUM_FEATURES)).astype(np.int64))
    tid = np.concatenate(tids) if tids else np.empty(0, np.int64)
    return np.unique(tid, return_counts=True)


def _idf_finalize(tid_all: np.ndarray, df_all: np.ndarray, n: float):
    tid, inv = np.unique(tid_all, return_inverse=True)
    df = np.bincount(inv, weights=df_all) if len(tid) else np.empty(0, np.float64)
    return tid, np.log(1.0 + n / df)


def _idf_combine_arrays(num_docs, *partials):
    """Dense-accumulate combine: tids live in the fixed 2^20 feature
    space, so one 8 MB float64 buffer + per-partial scatter-add replaces
    the concat + np.unique sort over tens of millions of partial rows
    (the old combine was a single ~4-6 s task gating every scorer actor's
    load())."""
    df = np.zeros(IDF_NUM_FEATURES, np.float64)
    for tid, cnt in partials:
        df[tid] += cnt
    nz = np.flatnonzero(df)
    return nz.astype(np.int64), np.log(1.0 + float(num_docs) / df[nz])


def build_idf_async(conversations, num_docs: int):
    """Task-parallel IDF build over the MATERIALIZED conversation blocks:
    one Ray task per block computes the (tid, df) partial, one combine
    task bincounts them. Returns the combine task's ObjectRef — pass it
    straight to the scorer actors (their ``ray.get`` blocks until ready),
    so the whole build overlaps blocking/pair-gen instead of sitting on
    the driver's critical path. Result is identical to ``build_idf``
    (same partial + combine code)."""
    from ..util import _cached_remote

    # materialized input ⇒ to_arrow_refs returns existing block refs with
    # no new execution; the partial reads only the tokens column
    refs = list(conversations.to_arrow_refs())
    part = _cached_remote(_idf_partial_arrays)
    combine = _cached_remote(_idf_combine_arrays)
    return combine.remote(num_docs, *[part.remote(r) for r in refs])


def build_idf(conversations_tok, num_docs: int | None = None,
              combine_threshold: int = 50_000_000):
    """Corpus document-frequency table → ``(tid_sorted, idf_values)`` numpy
    pair (driver-side, bounded by the 2^20 hashed-feature space). Numpy
    arrays (not a python dict) so the ``ray.put`` broadcast is zero-copy
    and scorer lookups are vectorized ``searchsorted``, never per-token
    python ``.get``.

    Partial-aggregate pattern (ray_guide "Aggregation at scale"): per batch
    emit per-doc-unique hashed token ids pre-summed within the batch, then
    a HYBRID final combine: below ``combine_threshold`` partial rows the
    driver bincounts the gathered partials (no shuffle on the critical
    path); above it one ``groupby(tid).sum`` shuffle reduces to ≤ 2^20
    rows first, so the driver gather stays bounded at any corpus size.
    """
    from ..functions.similarity import _packed_unique

    def partial(batch: pa.Table) -> pa.Table:
        u, c = _idf_partial_arrays(batch)
        return pa.table({"tid": pa.array(u, pa.int64()), "df": pa.array(c, pa.int64())})

    parts = conversations_tok.select_columns(["tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if parts.count() > combine_threshold:
        from ray.data.aggregate import Sum

        parts = parts.groupby("tid").aggregate(
            Sum("df", alias_name="df")).materialize()

    from ..util import dataset_to_arrow

    tbl = dataset_to_arrow(parts)
    tid_all = np.asarray(tbl["tid"], np.int64) if tbl.num_rows else np.empty(0, np.int64)
    df_all = np.asarray(tbl["df"], np.float64) if tbl.num_rows else np.empty(0, np.float64)
    tid, inv = np.unique(tid_all, return_inverse=True)
    df = np.bincount(inv, weights=df_all) if len(tid) else np.empty(0, np.float64)
    n = float(num_docs) if num_docs is not None else float(df.max() if len(df) else 1)
    return tid, np.log(1.0 + n / df)


class PairScorer:
    """Actor-pool callable: one Arrow batch of pairs → SCORED_PAIRS batch."""

    def __init__(self, idf_ref=None, weights=None, max_chars: int = MAX_SIM_CHARS,
                 token_sequence_sim: bool = False):
        self.kernel = StringSimKernel(max_chars)
        self.weights = dict(DEFAULT_WEIGHTS if weights is None else weights)
        # optional token-sequence mode: JW/Levenshtein over one-codepoint-
        # per-token encodings (see encode_tokens_to_string). Measured on
        # the synthetic corpus it is BOTH slower than char@128 (python
        # string-building overhead) and less separating (pos_p1 0.62 vs
        # 0.71), so char mode is the default; kept as a config for corpora
        # with very long tokens where char-DP cost would dominate.
        self.token_sequence_sim = token_sequence_sim
        self.sub_t = [0.0, 0.0, 0.0]  # tokenize / jw+lev / jaccard+tfidf
        self.idf = None
        if idf_ref is not None:
            import ray

            self.idf = ray.get(idf_ref)  # broadcast table, fetched once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        def col(name):
            c = batch[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        _t0 = _time.monotonic()
        tl, tr = col("text_left"), col("text_right")
        names = batch.schema.names
        prehashed = "thash_left" in names and "ttf_left" in names
        # binary-packed variant of the same payload (giant-corpus join
        # path: Acero buckets can't carry list columns, so thash/ttf
        # arrive as pack_hash_list binary)
        packed = "thashb_left" in names and "ttfb_left" in names
        if prehashed or packed:
            kl = kr = None  # hashes precomputed at assembly — no tokenize
        elif "tokens_left" in names and "tokens_right" in names:
            kl, kr = col("tokens_left"), col("tokens_right")
        else:
            # tokens are re-derived here (vectorized) rather than carried
            # through the pair join — list<string> can't ride Arrow's hash
            # join and would double the shuffle payload
            from ..functions.text import tokenize_array

            kl, kr = tokenize_array(tl), tokenize_array(tr)
        _t1 = _time.monotonic()
        if self.token_sequence_sim:
            if prehashed or packed:
                raise ValueError(
                    "token_sequence_sim needs token strings — incompatible "
                    "with the prehashed (thash) attach columns")
            jw, lev = self.kernel(
                encode_tokens_to_string(kl), encode_tokens_to_string(kr)
            )
        else:
            jw, lev = self.kernel(tl, tr)
        _t2 = _time.monotonic()
        if prehashed or packed:
            from ..functions.similarity import token_pair_scores_prehashed

            if packed:
                from .pairs import unpack_hash_bin

                lh, lo = unpack_hash_bin(col("thashb_left"), np.uint64)
                rh, ro = unpack_hash_bin(col("thashb_right"), np.uint64)
                ltf, _ = unpack_hash_bin(col("ttfb_left"), np.int32)
                rtf, _ = unpack_hash_bin(col("ttfb_right"), np.int32)
            else:
                from ..functions.minhash import hash_list_arrays

                lh, lo = hash_list_arrays(col("thash_left"))
                rh, ro = hash_list_arrays(col("thash_right"))
                ltf, _ = hash_list_arrays(col("ttf_left"), dtype=np.int32)
                rtf, _ = hash_list_arrays(col("ttf_right"), dtype=np.int32)
            jac, cos = token_pair_scores_prehashed(
                lh, lo, ltf, rh, ro, rtf, self.idf, IDF_NUM_FEATURES)
        else:
            # fused: one hash + one packed-unique sort per side for BOTH
            # metrics
            jac, cos = token_pair_scores(kl, kr, self.idf, IDF_NUM_FEATURES)
        _t3 = _time.monotonic()
        self.sub_t[0] += _t1 - _t0
        self.sub_t[1] += _t2 - _t1
        self.sub_t[2] += _t3 - _t2
        w = self.weights
        score = (
            w["jaccard"] * jac
            + w["jaro_winkler"] * jw
            + w["levenshtein"] * lev
            + w["tfidf_cosine"] * cos
        )
        return pa.table(
            {
                "conv_id_left": col("conv_id_left"),
                "conv_id_right": col("conv_id_right"),
                "jaccard": pa.array(jac, pa.float64()),
                "jaro_winkler": pa.array(jw, pa.float64()),
                "levenshtein": pa.array(lev, pa.float64()),
                "tfidf_cosine": pa.array(cos, pa.float64()),
                "score": pa.array(score, pa.float64()),
            }
        )


class BlockScorer:
    """Raw-Ray-actor scorer: attach side payloads (sharded zero-copy
    broadcast index) + score ONE pair block per call.

    Why raw actors instead of ``map_batches(PairScorer, ...)``: a Data
    actor pool only starts spinning up when the scoring dataset executes —
    AFTER the pair barrier — so every run pays pool spin-up (process
    start, imports, DuckDB connect, IDF fetch) serially on the critical
    path.

    TWO-PHASE startup: ``__init__`` takes no refs, so the pool can be
    created at the very top of ``run_er`` — process spawn + imports (~3-4
    core-s each, 16× concurrently ≈ 20 s wall under load) overlap the
    ASSEMBLE stage. ``load()`` is dispatched (fire-and-forget) the moment
    the side-index/IDF build tasks are launched; it blocks inside the
    actor until they resolve, then prewarms. ``score_block`` calls queue
    behind ``load`` in the actor's mailbox, so scoring never starts on a
    cold actor and the driver never waits.

    ``num_cpus=0`` so idle actors don't reserve cores the overlapping
    assemble/pair-gen stages need; during scoring nothing else runs, and
    the pool is sized to the node's cores by ``start_scorer_pool``.

    Refs arrive WRAPPED in lists (``[ref]``): Ray auto-derefs top-level
    args but not nested ones, and PairScorer/sharded_lookup need the refs
    themselves.
    """

    def __init__(self, weights=None, columns=("text",),
                 batch_size: int = 2048):
        self.columns = tuple(columns)
        self.batch_size = batch_size
        self.weights = weights
        self.scorer = PairScorer(idf_ref=None, weights=weights)
        self.idxs = None

    def load(self, idf_ref_holder=None, shard_refs=None) -> bool:
        """Resolve the broadcast IDF + side-index shards and prewarm.
        Runs overlapped with blocking/pair-gen; blocks (inside the actor,
        off the driver's critical path) until the background build tasks
        finish."""
        import os
        import sys
        import time

        import ray

        prof = os.environ.get("GRAFT_SCORE_PROF")
        # order matters: the side-index shards resolve early (sharded
        # build over materialized blocks), the IDF combine LAST (it waits
        # on every partial, measured ~15 s into pair-gen at 240k clusters).
        # Prewarm between the two so it runs inside the overlap window
        # instead of queueing behind the IDF wait.
        t0 = time.time()
        self.idxs = [ray.get(r) for r in shard_refs] if shard_refs else None
        t1 = time.time()
        if self.idxs is not None:
            # attach exactly what the index carries (insertion order:
            # __hash/__order/__key then payload columns) — the pool is
            # spawned before the conversation schema is known
            self.columns = tuple(
                k for k in self.idxs[0] if not k.startswith("__"))
            self._prewarm()
        t2 = time.time()
        if idf_ref_holder:
            self.scorer.idf = ray.get(idf_ref_holder[0])
        if prof:
            print(f"LOADPROF pid={os.getpid()} start={t0:.2f} "
                  f"shards={t1 - t0:.2f} warm={t2 - t1:.2f} "
                  f"idf={time.time() - t2:.2f}",
                  file=sys.stderr, flush=True)
        return True

    def _prewarm(self):
        """Warm the attach + kernel paths with realistic work.

        Measured (240k-cluster corpus, 16-cpu leg): the FIRST
        ``score_block`` per actor paid ~3-10 s of attach — all 16 actors
        issue their first random gather over the ~GB shared index at the
        same instant (the score barrier), and the synchronized fault+gather
        storm runs ~10× slower per actor than the steady state — plus
        ~1-2 s of kernel/DuckDB warm-up. That is ~100-180 core-s ON the
        scoring critical path, 4× the 4-actor leg's bill — the largest
        cpu-count-proportional term in the measured scaling-efficiency
        gap. Here the same storm runs inside ``load()``, hidden behind
        blocking/pair-gen.

        The gather warm-up is a strided ``sharded_lookup`` over ~1/16 of
        the index keys — same code path, same random-access pattern over
        the hash-permuted payloads as a real attach."""
        from ..util import hash_sharded_lookup, sharded_lookup, touch_pages

        touch_pages(self.idxs)
        keys = [s["__key"] for s in self.idxs if len(s["__key"])]
        if not keys:
            return
        sample = pa.concat_arrays([k.slice(0, len(k)).take(
            pa.array(np.arange(0, len(k), 16))) for k in keys])
        for c in self.columns:
            sharded_lookup(self.idxs, sample, c)
        # warm the hash-keyed path too (the hashed pair route): same
        # payload gathers, different routing/search arrays
        hsample = np.concatenate(
            [s["__hash"][::16] for s in self.idxs if len(s["__hash"])])
        hash_sharded_lookup(self.idxs, hsample, "__key")
        n = min(len(keys[0]), self.batch_size)
        ids = keys[0].slice(0, n)
        warm = {"conv_id_left": ids, "conv_id_right": ids}
        for c in self.columns:
            v = self.idxs[0][c].slice(0, n)
            warm[f"{c}_left"] = v
            warm[f"{c}_right"] = v
        self.scorer(pa.table(warm))

    def _attach_hashed(self, tbl: pa.Table) -> dict:
        """uint64 hash pairs (``hl``/``hr`` from the hashed pair path) →
        conv_id strings + side payloads via ``hash_sharded_lookup``, with
        the OUTPUT orientation restored to lexicographic
        ``conv_id_left < conv_id_right`` (the internal canonical order is
        numeric hash order; every pair feature is symmetric, so only the
        two id columns need swapping)."""
        import pyarrow.compute as pc

        from ..util import hash_sharded_lookup_multi

        hl = tbl["hl"].to_numpy(zero_copy_only=False)
        hr = tbl["hr"].to_numpy(zero_copy_only=False)
        cols = ("__key", *self.columns)
        L = hash_sharded_lookup_multi(self.idxs, hl, cols)
        R = hash_sharded_lookup_multi(self.idxs, hr, cols)
        swap = pc.greater(L["__key"], R["__key"])
        out = {
            "conv_id_left": pc.if_else(swap, R["__key"], L["__key"]),
            "conv_id_right": pc.if_else(swap, L["__key"], R["__key"]),
        }
        for c in self.columns:
            out[f"{c}_left"] = L[c]
            out[f"{c}_right"] = R[c]
        return out

    def score_block(self, tbl: pa.Table, start: int = 0,
                    length: int | None = None) -> pa.Table:
        import os
        import sys
        import time

        from ..schema import SCORED_PAIRS
        from ..util import sharded_lookup

        if length is not None:
            tbl = tbl.slice(start, length)  # zero-copy sub-block dispatch
        if tbl.num_rows == 0:
            return SCORED_PAIRS.empty_table()
        prof = os.environ.get("GRAFT_SCORE_PROF")
        w0 = time.time()
        cpu0 = time.process_time()
        t0 = time.monotonic()
        # attach once per block (index take is cheap at any size), but
        # SCORE in fixed-size chunks: a 70k-row block through the packed-
        # sort kernels allocates ~GB-scale sort temporaries and the rate
        # HALVES vs ~2k-row chunks (measured at the 240k scaling corpus —
        # same lesson as CLAUDE.md's "large numpy temporaries" note)
        if "hl" in tbl.schema.names:
            out = self._attach_hashed(tbl)
        else:
            out = {n: tbl[n] for n in tbl.schema.names}
            for c in self.columns:
                out[f"{c}_left"] = sharded_lookup(
                    self.idxs, tbl["conv_id_left"], c)
                out[f"{c}_right"] = sharded_lookup(
                    self.idxs, tbl["conv_id_right"], c)
        c0 = self.columns[0]
        if out[f"{c0}_left"].null_count or out[f"{c0}_right"].null_count:
            raise ValueError(
                "BlockScorer: pair references conv_ids absent from the "
                "conversation table"
            )
        attached = pa.table(out)
        t1 = time.monotonic()
        n = attached.num_rows
        if n <= self.batch_size:
            res = self.scorer(attached)
        else:
            parts = [
                self.scorer(attached.slice(s, self.batch_size))
                for s in range(0, n, self.batch_size)
            ]
            res = pa.concat_tables(parts)
        if prof:
            t2 = time.monotonic()
            st = self.scorer.sub_t
            print(
                f"SCOREPROF pid={os.getpid()} rows={n} "
                f"attach={t1 - t0:.3f} kernel={t2 - t1:.3f} "
                f"wall0={w0:.2f} cpu={time.process_time() - cpu0:.3f} "
                f"tok={st[0]:.2f} jwlev={st[1]:.2f} tps={st[2]:.2f}",
                file=sys.stderr, flush=True,
            )
        return res


def start_scorer_pool(n_actors: int, weights=None, columns=("text",),
                      batch_size: int = 2048):
    """Create ``n_actors`` BlockScorer actors NOW (process spawn + imports
    start immediately, in the background); returns the handle list. Call
    ``load_scorer_pool`` once the side-index/IDF build refs exist, then
    ``score_with_pool``. Kill with ``ray.kill`` when scoring is done so
    the processes free their memory before downstream stages."""
    import ray

    Actor = ray.remote(num_cpus=0)(BlockScorer)
    return [
        Actor.remote(weights=weights, columns=columns, batch_size=batch_size)
        for _ in range(n_actors)
    ]


def load_scorer_pool(pool, idf_ref=None, shard_refs=None):
    """Fire-and-forget ``load`` on every pool actor: each resolves the
    (possibly still-running) build-task refs and prewarms, overlapped with
    blocking/pair-gen. Returns the ack refs (safe to drop; ``score_block``
    calls queue behind ``load`` in each actor's mailbox)."""
    holder = [idf_ref] if idf_ref is not None else None
    return [a.load.remote(idf_ref_holder=holder, shard_refs=shard_refs)
            for a in pool]


def score_with_pool(pairs, pool):
    """Dispatch the materialized pair blocks over the scorer pool with
    greedy longest-processing-time balancing (block row counts from block
    metadata — no extra pass) → SCORED_PAIRS dataset."""
    import ray.data as rd
    from ray.data.dataset import MaterializedDataset

    import os
    import sys
    import time

    prof = os.environ.get("GRAFT_SCORE_PROF")
    w0 = time.time()
    mat = pairs if isinstance(pairs, MaterializedDataset) else pairs.materialize()
    w1 = time.time()
    blocks: list[tuple] = []
    for rb in mat.iter_internal_ref_bundles():
        for ref, meta in rb.blocks:
            blocks.append((ref, meta.num_rows or 0))
    if prof:
        print(f"POOLPROF mat={w1 - w0:.2f} bundles={time.time() - w1:.2f}",
              file=sys.stderr, flush=True)
    if not blocks:
        from ..schema import SCORED_PAIRS

        return rd.from_arrow(SCORED_PAIRS.empty_table())
    # split oversized blocks into zero-copy slices so the LPT schedule's
    # last wave has no multi-second straggler (the slice happens inside
    # the actor — only (ref, start, len) travels)
    total = sum(r for _, r in blocks)
    cap = max(4096, -(-total // (len(pool) * 4)))
    units: list[tuple] = []
    for ref, rows in blocks:
        if rows <= cap:
            units.append((ref, 0, None, rows))
        else:
            for s in range(0, rows, cap):
                n = min(cap, rows - s)
                units.append((ref, s, n, n))
    loads = [0] * len(pool)
    outs = []
    for ref, s, ln, rows in sorted(units, key=lambda u: -u[3]):
        i = loads.index(min(loads))
        outs.append(pool[i].score_block.remote(ref, s, ln))
        loads[i] += rows + 1
    if prof:
        print(f"POOLPROF dispatched n={len(outs)} at={time.time():.2f}",
              file=sys.stderr, flush=True)
    return rd.from_arrow_refs(outs)


_FUSED_SCORERS: dict = {}


def make_fused_scorer(idf_ref=None, weights=None, batch_size: int = 2048):
    """Table→table scoring callable for ``bucketed_join(post=...)`` — the
    fused giant-corpus path: each joined bucket is scored INSIDE the
    reduce task, so the per-pair side payloads never enter the object
    store; only (ids, features, score) rows do (~100 B/pair vs ~2 KB).

    The underlying :class:`PairScorer` (DuckDB connection, fetched IDF
    table) is cached per worker PROCESS keyed by (idf_ref, weights), so
    n_workers constructions, not n_buckets. Handles empty buckets (the
    ``post`` contract) and slices big buckets to ``batch_size`` to bound
    kernel temporaries (the CLAUDE.md whole-block page-fault tax)."""

    wkey = tuple(sorted(weights.items())) if weights else None

    def fused(tbl: pa.Table) -> pa.Table:
        key = (idf_ref, wkey, "fused")
        sc = _FUSED_SCORERS.get(key)
        if sc is None:
            sc = PairScorer(idf_ref=idf_ref, weights=weights)
            _FUSED_SCORERS[key] = sc
        if tbl.num_rows <= batch_size:
            return sc(tbl)
        outs = [sc(tbl.slice(s, batch_size))
                for s in range(0, tbl.num_rows, batch_size)]
        return pa.concat_tables(outs)

    return fused


def score_pairs(
    pairs_with_sides,
    idf_ref=None,
    weights=None,
    concurrency=4,
    batch_size: int = 2048,
    num_cpus: float = 1,
    scorer_cls=None,
):
    """pairs (with text/tokens sides attached) → SCORED_PAIRS dataset.

    Fixed-size pool (int concurrency): scoring starts after the pair
    barrier, so the pool is under immediate full load — an autoscaling
    ``(2, n)`` pool measured ~40% slower (ramps too late).

    ``scorer_cls``: registry-resolved stage class (registry.py scorer
    protocol); defaults to the built-in :class:`PairScorer`."""
    return pairs_with_sides.map_batches(
        scorer_cls or PairScorer,
        fn_constructor_kwargs={"idf_ref": idf_ref, "weights": weights},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def edges_from_scores(scored, threshold: float = 0.5):
    """Threshold scored pairs → EDGES dataset (src,dst)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.greater_equal(batch["score"], pa.scalar(threshold)))
        return pa.table(
            {"src": keep["conv_id_left"], "dst": keep["conv_id_right"]}
        )

    return scored.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
