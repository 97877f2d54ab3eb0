"""Training-data curation operators: distribution-based quality
filtering and deterministic shard packing.

Extensions beyond the reference (its only corpus filter is the fixed
cluster-size rule, ``scripts/construction/build_ali_dataset.py:355-358``)
— the two steps an LLM-training corpus pipeline runs after dedup:

* ``quality_filter`` — keep documents whose length sits inside the
  [q_lo, q_hi] quantile band OF THEIR LANGUAGE (outlier trimming that a
  global threshold gets wrong for mixed-language corpora). Scale shape:
  per-lang bounds via one hash exchange over the (lang, n_chars)
  projection (never the text column), the tiny bounds table broadcasts
  into a vectorized filter pass. Oracle: DuckDB ``quantile_cont`` per
  lang + join-filter, with the shared rint-rounding recipe on the
  bounds so boundary comparisons are bitwise-identical.
* ``shard_pack`` — assign each document to a training shard so shards
  hold ~``budget`` chars of consecutive-by-doc_id documents: the
  classic two-phase distributed prefix sum (per-block sums → exclusive
  driver cumsum of ONE scalar per block → per-block vectorized shard
  ids). Integer arithmetic end-to-end → exact oracle via a window
  cumsum. The driver never sees rows, only one int64 per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketches import _quantile_cont, _rp

Q_LO = 0.05
Q_HI = 0.95
SHARD_BUDGET_CHARS = 100_000
_QSCALE = float(10**6)  # shared rint recipe digits for quantile bounds


def quality_filter(sf_dir: str, q_lo: float = Q_LO, q_hi: float = Q_HI):
    """Docs with ``q_lo <= rank(n_chars | lang) <= q_hi``; columns
    (doc_id, lang, n_chars)."""
    from ..util import hash_exchange

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    mat = ds.materialize()

    def _bounds(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "lo": pa.array([], pa.float64()),
                "hi": pa.array([], pa.float64()),
            })
        d = t["lang"].combine_chunks().dictionary_encode()
        codes = np.asarray(d.indices, np.int64)
        vals = np.asarray(t["n_chars"], np.float64)
        order = np.lexsort((vals, codes))
        cs, vs = codes[order], vals[order]
        edges = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1], True])
        dict_vals = d.dictionary.to_pylist()
        langs, los, his = [], [], []
        for s, e in zip(edges[:-1], edges[1:]):
            g = vs[s:e]
            langs.append(dict_vals[cs[s]])
            los.append(np.rint(_quantile_cont(g, q_lo) * _QSCALE) / _QSCALE)
            his.append(np.rint(_quantile_cont(g, q_hi) * _QSCALE) / _QSCALE)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "lo": pa.array(los, pa.float64()),
                         "hi": pa.array(his, pa.float64())})

    # lang cardinality is tiny — the bounds table is a handful of rows,
    # safe to gather and close over (re-shipped per task, <1 KiB)
    bt = hash_exchange(mat.select_columns(["lang", "n_chars"]), "lang",
                       num_buckets=4, reduce_fn=_bounds, arrow=True)
    bdf = bt.to_pandas()
    lo_of = dict(zip(bdf["lang"], bdf["lo"]))
    hi_of = dict(zip(bdf["lang"], bdf["hi"]))

    def _keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        d = t["lang"].combine_chunks().dictionary_encode()
        codes = np.asarray(d.indices, np.int64)
        dict_vals = d.dictionary.to_pylist()
        lo = np.asarray([lo_of[v] for v in dict_vals])[codes]
        hi = np.asarray([hi_of[v] for v in dict_vals])[codes]
        n = np.asarray(t["n_chars"], np.float64)
        return t.filter(pa.array((n >= lo) & (n <= hi)))

    return mat.map_batches(_keep, batch_format="pyarrow",
                           zero_copy_batch=True)


EVAL_MOD = 97  # deterministic stand-in eval set: doc_id % EVAL_MOD == 0


def decontaminate(sf_dir: str, eval_mod: int = EVAL_MOD):
    """Exact-match decontamination: drop every corpus document whose
    NORMALIZED-content fingerprint appears in the held-out eval set (the
    deterministic ``doc_id % eval_mod == 0`` subset stands in for an
    external benchmark). Removes not just the eval rows but every exact
    duplicate of them anywhere in the corpus — the base tier of the
    standard pre-training leakage screen.

    Scale shape: the eval side is small by construction — its md5
    fingerprints gather once into an Arrow string array broadcast via
    ``ray.put`` (zero-copy in every filter task); the corpus side
    streams through one ``map_batches`` and is never shuffled. An eval
    side too big to broadcast switches to ``util.bucketed_semi_join``
    (the ``relational._semi_anti`` hybrid rule). md5 (not xxhash) so
    DuckDB's ``md5()`` reproduces the fingerprints as the oracle."""
    import hashlib

    import pyarrow.compute as pc
    import ray

    from ..functions.text import normalize

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def _fps(norm: pa.Array) -> pa.Array:
        return pa.array(
            [hashlib.md5((s or "").encode()).hexdigest()
             for s in norm.to_pylist()], pa.string())

    def _eval_fps(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.int64)
        sub = t.filter(pa.array(ids % eval_mod == 0))
        return pa.table({"fp": _fps(normalize(sub["text"]))})

    parts = [r for r in ray.get(
        ds.map_batches(_eval_fps, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())]
    tbls = [pa.Table.from_batches([p]) if isinstance(p, pa.RecordBatch)
            else p for p in parts]
    tbls = [t for t in tbls if t.num_rows]
    eval_set = (pc.unique(pa.concat_tables(tbls)["fp"].combine_chunks())
                if tbls else pa.array([], pa.string()))
    ref = ray.put(eval_set)

    def _keep(t: pa.Table) -> pa.Table:
        fp = _fps(normalize(t["text"]))
        mask = pc.invert(pc.is_in(fp, value_set=ray.get(ref)))
        return t.select(["doc_id", "lang"]).filter(mask)

    return ds.map_batches(_keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def shard_pack(sf_dir: str, budget: int = SHARD_BUDGET_CHARS):
    """(doc_id, n_chars, shard_id): shard_id = exclusive running char
    total in doc_id order, integer-divided by ``budget``."""
    import ray
    import ray.data as rd

    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    mat = ds.sort("doc_id").materialize()
    refs = list(mat.to_arrow_refs())
    if not refs:
        return mat

    @ray.remote
    def _block_sum(t: pa.Table) -> int:
        import pyarrow.compute as pc

        return int(pc.sum(t["n_chars"]).as_py() or 0)

    @ray.remote
    def _assign(t: pa.Table, offset: int, b: int) -> pa.Table:
        n = np.asarray(t["n_chars"], np.int64)
        cum_excl = offset + np.concatenate(([0], np.cumsum(n[:-1])))
        return t.append_column(
            "shard_id", pa.array(cum_excl // b, pa.int64()))

    sums = ray.get([_block_sum.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(sums[:-1]))).astype(np.int64)
    out = [_assign.remote(r, int(o), budget) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out)
