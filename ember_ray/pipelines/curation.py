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
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    mat = ds.materialize()
    lo_of, hi_of = _lang_bounds(mat, q_lo, q_hi)

    def _keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(_quality_mask(t, lo_of, hi_of))

    return mat.map_batches(_keep, batch_format="pyarrow",
                           zero_copy_batch=True)


def _quality_mask(t: pa.Table, lo_of: dict, hi_of: dict) -> pa.Array:
    d = t["lang"].combine_chunks().dictionary_encode()
    codes = np.asarray(d.indices, np.int64)
    dict_vals = d.dictionary.to_pylist()
    lo = np.asarray([lo_of[v] for v in dict_vals])[codes]
    hi = np.asarray([hi_of[v] for v in dict_vals])[codes]
    n = np.asarray(t["n_chars"], np.float64)
    return pa.array((n >= lo) & (n <= hi))


def _lang_bounds(mat, q_lo: float, q_hi: float):
    """Per-language [lo, hi] n_chars quantile bounds: one (lang, n_chars)
    exchange; the tiny result gathers to two dicts (lang cardinality is
    a handful — <1 KiB closed over per task)."""
    from ..util import hash_exchange

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

    bt = hash_exchange(mat.select_columns(["lang", "n_chars"]), "lang",
                       num_buckets=4, reduce_fn=_bounds, arrow=True)
    bdf = bt.to_pandas()
    return (dict(zip(bdf["lang"], bdf["lo"])),
            dict(zip(bdf["lang"], bdf["hi"])))


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
    import pyarrow.compute as pc
    import ray

    from ..functions.text import normalize

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    ref = _eval_fp_ref(ds, eval_mod)

    def _keep(t: pa.Table) -> pa.Table:
        fp = _md5_fps(normalize(t["text"]))
        mask = pc.invert(pc.is_in(fp, value_set=ray.get(ref)))
        return t.select(["doc_id", "lang"]).filter(mask)

    return ds.map_batches(_keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def _md5_fps(norm: pa.Array) -> pa.Array:
    import hashlib

    return pa.array(
        [hashlib.md5((s or "").encode()).hexdigest()
         for s in norm.to_pylist()], pa.string())


def _eval_fp_ref(ds, eval_mod: int):
    """Gather the eval subset's normalized-content fingerprints once and
    broadcast them (small by construction — one ObjectRef, zero-copy in
    every reader task)."""
    import pyarrow.compute as pc
    import ray

    from ..functions.text import normalize

    def _eval_fps(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.int64)
        sub = t.filter(pa.array(ids % eval_mod == 0))
        return pa.table({"fp": _md5_fps(normalize(sub["text"]))})

    parts = ray.get(
        ds.map_batches(_eval_fps, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())
    tbls = [pa.Table.from_batches([p]) if isinstance(p, pa.RecordBatch)
            else p for p in parts]
    tbls = [t for t in tbls if t.num_rows]
    eval_set = (pc.unique(pa.concat_tables(tbls)["fp"].combine_chunks())
                if tbls else pa.array([], pa.string()))
    return ray.put(eval_set)


def shard_pack(sf_dir: str, budget: int = SHARD_BUDGET_CHARS):
    """(doc_id, n_chars, shard_id): shard_id = exclusive running char
    total in doc_id order, integer-divided by ``budget``."""
    return _shard_pack_ds(
        _rp(sf_dir, "documents", columns=["doc_id", "n_chars"]), budget)


def _shard_pack_ds(ds, budget: int = SHARD_BUDGET_CHARS):
    """Two-phase distributed prefix sum over an arbitrary dataset with
    (doc_id, n_chars [, carried columns])."""
    import ray
    import ray.data as rd

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


def curation_pipeline(sf_dir: str, q_lo: float = Q_LO, q_hi: float = Q_HI,
                      eval_mod: int = EVAL_MOD,
                      budget: int = SHARD_BUDGET_CHARS,
                      num_buckets: int = 16):
    """The composed post-dedup curation flow as ONE streaming pipeline:
    per-language quality band -> exact-match decontamination -> exact
    dedup (min doc_id per normalized fingerprint) -> shard packing.

    Composition shape (what this op demonstrates beyond its parts): the
    two small side-inputs (per-lang bounds dict, eval fingerprint set)
    come from column-pruned passes that never read ``text`` twice more
    than needed; the corpus then streams through ONE fused map_batches
    (quality mask + fingerprint + contamination filter in a single
    batch visit — the text column is read once and never shuffled),
    ONE fp-keyed hash exchange for the dedup group-min, and the
    two-phase prefix-sum shard assignment. No full-corpus
    materialization besides the sort/exchange boundaries the semantics
    require."""
    import pyarrow.compute as pc
    import ray

    from ..functions.text import normalize
    from ..util import hash_exchange

    # side input 1: per-lang quantile bounds ((lang, n_chars) only)
    lo_of, hi_of = _lang_bounds(
        _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
        .materialize(), q_lo, q_hi)
    # side input 2: eval fingerprint set ((doc_id, text) only)
    ref = _eval_fp_ref(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), eval_mod)

    ds = _rp(sf_dir, "documents",
             columns=["doc_id", "lang", "n_chars", "text"])

    def _fused(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "n_chars": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.string())})
        t = t.filter(_quality_mask(t, lo_of, hi_of))
        fp = _md5_fps(normalize(t["text"]))
        keep = pc.invert(pc.is_in(fp, value_set=ray.get(ref)))
        return (t.select(["doc_id", "lang", "n_chars"])
                .append_column("fp", fp).filter(keep))

    survivors = ds.map_batches(_fused, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _min_per_fp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["fp"])
        g = t.group_by("fp").aggregate([("doc_id", "min")])
        keep = pc.is_in(t["doc_id"],
                        value_set=g["doc_id_min"].combine_chunks())
        return t.filter(keep).drop_columns(["fp"])

    deduped = hash_exchange(survivors, key="fp", num_buckets=num_buckets,
                            reduce_fn=_min_per_fp, arrow=True)
    return _shard_pack_ds(deduped, budget)


# per-language sampling fractions (corpus mixing weights); the threshold
# compare happens on the first 8 hex chars of the md5 fingerprint, where
# numeric order == lexicographic order, so BOTH engines compare strings
SAMPLE_FRACS = {"en": 0.5, "de": 0.4, "fr": 0.3, "es": 0.2, "zh": 0.1}
_DEFAULT_FRAC = 0.1


def frac_threshold_hex(frac: float) -> str:
    return format(min(int(frac * 16**8), 16**8 - 1), "08x")


def stratified_sample(sf_dir: str, fracs: dict | None = None):
    """Deterministic content-hash stratified sampling: keep a document
    iff the first 8 hex chars of its normalized-content md5 fall below
    its language's threshold. Reproducible across runs, engines and
    partitionings (no RNG state), and a superset/subset relation holds
    between any two fractions — the property corpus-mixing ablations
    need. Pure streaming map_batches; nothing shuffles, nothing
    gathers."""
    import pyarrow.compute as pc

    from ..functions.text import normalize

    fr = SAMPLE_FRACS if fracs is None else fracs
    thr_of = {k: frac_threshold_hex(v) for k, v in fr.items()}

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def _keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string())})
        pre = pc.utf8_slice_codeunits(
            _md5_fps(normalize(t["text"])), 0, 8)
        d = t["lang"].combine_chunks().dictionary_encode()
        codes = np.asarray(d.indices, np.int64)
        thr = np.asarray([thr_of.get(v, frac_threshold_hex(_DEFAULT_FRAC))
                          for v in d.dictionary.to_pylist()], object)[codes]
        mask = pa.array(np.asarray(pre, object) < thr)
        return t.select(["doc_id", "lang"]).filter(mask)

    return ds.map_batches(_keep, batch_format="pyarrow",
                          zero_copy_batch=True)


WEIGHTED_SAMPLE_SCALE = 20000.0  # chars: inclusion prob = min(1, n/SCALE)


def weighted_sample(sf_dir: str, scale: float = WEIGHTED_SAMPLE_SCALE):
    """Deterministic weighted Bernoulli sampling: include each document
    with probability proportional to its length (min(1, n_chars/scale))
    — the token-budget-proportional corpus-mixing draw (longer documents
    carry more training tokens, so length-proportional inclusion keeps
    the sampled TOKEN mass unbiased at a fixed document budget; see
    Efraimidis & Spirakis 2006 for the weighted-sampling family). The
    per-doc uniform is content-derived — first 13 hex chars of the
    normalized-text md5 mapped to (0, 1] — so the draw is reproducible
    across runs, engines and partitionings (no RNG state), and, like
    :func:`stratified_sample`, a larger ``scale`` selects a subset of a
    smaller one.

    Float parity is by PINNED EXPRESSION over exact integers on both
    engines — keep iff ``((h13 + 1) / (2^52 + 1)) * scale < n_chars``
    with identical divide/multiply order; no transcendentals, no
    rounding (the Efraimidis–Spirakis ``u^(1/w)`` key needs ``pow``,
    whose libm implementations differ across engines — Bernoulli
    inclusion gives the same proportionality with arithmetic only).
    Pure streaming map_batches; nothing shuffles, nothing gathers."""
    from ..functions.text import normalize

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def _keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64())})
        fp = _md5_fps(normalize(t["text"]))
        h = np.array([int(s[:13], 16) for s in fp.to_pylist()], np.int64)
        u = (h + 1) / 4503599627370497.0
        keep = pa.array(u * scale < np.asarray(t["n_chars"], np.int64))
        return t.select(["doc_id", "n_chars"]).filter(keep)

    return ds.map_batches(_keep, batch_format="pyarrow",
                          zero_copy_batch=True)


NGRAM_DECON_N = 5  # gram width for the fuzzy contamination screen


def _doc_ngrams(texts, n: int):
    """All token n-grams in a batch of documents plus each gram's row
    index: ``(grams: pa.StringArray, doc_idx: np.int64[len(grams)])``.

    Same zero-copy construction as ``textops.ngram_counts`` (shifted
    ``Array.slice`` views over the flat token values joined element-wise;
    grams straddling a document boundary masked out via the list
    offsets). The kept grams are, per document, its first
    ``max(len_d - n + 1, 0)`` flat positions in order, so the row index
    is a plain ``np.repeat`` over those counts — no searchsorted."""
    import pyarrow.compute as pc

    from ..functions.text import tokenize_array

    toks = tokenize_array(texts)
    offsets = np.asarray(toks.offsets, np.int64)
    lens = np.diff(offsets)
    total = int(offsets[-1])
    L = total - (n - 1)
    if L <= 0:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    vals = toks.values
    grams = pc.binary_join_element_wise(
        *[vals.slice(j, L) for j in range(n)], " ")
    valid = np.ones(L, bool)
    for j in range(1, n):
        b = offsets[1:-1] - j
        b = b[(b >= 0) & (b < L)]
        valid[b] = False
    counts = np.maximum(lens - (n - 1), 0)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), counts)
    kept = grams.filter(pa.array(valid))
    assert len(kept) == len(doc_idx)
    return kept, doc_idx


def decontaminate_ngram(sf_dir: str, n: int = NGRAM_DECON_N,
                        eval_mod: int = EVAL_MOD):
    """Fuzzy decontamination: drop every corpus document that shares ANY
    normalized token ``n``-gram with the held-out eval set (the
    ``doc_id % eval_mod == 0`` stand-in) — the n-gram-collision leakage
    screen of the GPT-3 appendix-C / PaLM flavor, one tier stricter than
    the exact-match ``decontaminate``. Documents with fewer than ``n``
    tokens carry no grams and are always kept.

    Scale shape: a real eval side is a FIXED benchmark suite — its
    distinct n-gram set is bounded (millions of short strings) no matter
    how big the corpus grows, so it gathers once and broadcasts via
    ``ray.put`` (zero-copy Arrow in every filter task). The corpus side
    streams through one ``map_batches`` — per batch one tokenize, one
    vectorized gram build, one ``pc.is_in`` against the broadcast set,
    and a fancy-indexed any-hit reduction to row level; the text column
    is never shuffled and nothing corpus-sized ever lands on the
    driver."""
    import pyarrow.compute as pc
    import ray

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def _eval_grams(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.int64)
        sub = t.filter(pa.array(ids % eval_mod == 0))
        g, _ = _doc_ngrams(sub["text"], n)
        return pa.table({"g": pc.unique(g)})

    parts = ray.get(
        ds.map_batches(_eval_grams, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())
    tbls = [pa.Table.from_batches([p]) if isinstance(p, pa.RecordBatch)
            else p for p in parts]
    tbls = [t for t in tbls if t.num_rows]
    ev = (pc.unique(pa.concat_tables(tbls)["g"].combine_chunks())
          if tbls else pa.array([], pa.string()))
    ref = ray.put(ev)

    def _keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string())})
        g, di = _doc_ngrams(t["text"], n)
        bad = np.zeros(t.num_rows, bool)
        if len(di):
            hit = pc.is_in(g, value_set=ray.get(ref)).to_numpy(
                zero_copy_only=False)
            bad[di[hit]] = True
        return t.select(["doc_id", "lang"]).filter(pa.array(~bad))

    return ds.map_batches(_keep, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=4096)


def shuffle_order(sf_dir: str):
    """Deterministic global shuffle for training: assign every document
    a position in the content-hash order ``(md5(normalized text),
    doc_id)`` — the corpus-order randomization step before shard
    packing, reproducible across runs/engines/partitionings with no RNG
    state (same family as ``stratified_sample``; an epoch seed would
    concat into the hashed string).

    Scale shape: ONE distributed sort on the 40-byte (fp, doc_id)
    projection (text never moves — the fingerprint pass is streaming),
    then the same two-phase rank assignment as ``shard_pack``: per-block
    row counts -> exclusive driver cumsum of one int64 per block ->
    per-block vectorized ``offset + arange``. Ray's sort emits
    range-partitioned blocks in global order, which is what makes the
    prefix trick exact."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..functions.text import normalize

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def _fp(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "fp": _md5_fps(normalize(t["text"]))})

    mat = (ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)
           .sort(["fp", "doc_id"]).materialize())
    refs = list(mat.to_arrow_refs())
    if not refs:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "pos": pa.array([], pa.int64())}))

    @ray.remote
    def _nrows(t) -> int:
        return t.num_rows

    @ray.remote
    def _rank(t, off: int) -> pa.Table:
        t = pa.Table.from_batches([t]) if isinstance(t, pa.RecordBatch) else t
        return pa.table({
            "doc_id": t["doc_id"],
            "pos": pa.array(off + np.arange(t.num_rows, dtype=np.int64)),
        })

    counts = np.asarray(ray.get([_nrows.remote(r) for r in refs]), np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int64)
    return rd.from_arrow_refs(
        [_rank.remote(r, int(o)) for r, o in zip(refs, offsets)])


def pii_scrub(sf_dir: str):
    """PII redaction (curation extension): emails / phone extensions /
    residual digit runs → typed placeholders, plus a per-row redaction
    count — the scrub pass an LLM-training corpus runs before packing.

    The driver tables carry no live PII, so the query synthesizes a
    deterministic contact line per customer FROM INTEGER/STRING COLUMNS
    ONLY (float formatting differs between engines) with the exact same
    formula in the DuckDB oracle; the scrub itself is the generic
    :func:`ember_ray.functions.text.scrub_pii` RE2 chain, exercised on
    real email/phone shapes. Scale shape: stateless vectorized
    map_batches — no shuffle, no state; pytest plants free-text PII.
    """
    from ..functions.text import scrub_pii

    ds = _rp(sf_dir, "customer",
             columns=["c_custkey", "c_name", "c_mktsegment"])

    def _scrub(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({
                "c_custkey": pa.array([], pa.int64()),
                "contact": pa.array([], pa.string()),
                "n_pii": pa.array([], pa.int64()),
            })
        key = pc.cast(t["c_custkey"], pa.string())
        ext_num = pa.array(np.asarray(t["c_custkey"], np.int64) % 10_000)
        ext = pc.utf8_lpad(pc.cast(ext_num, pa.string()), 4, "0")
        contact = pc.binary_join_element_wise(
            t["c_name"], " <", pc.utf8_lower(t["c_mktsegment"]), ".", key,
            "@example.com> ext 555-", ext, "")
        scrubbed, n = scrub_pii(contact)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "contact": scrubbed,
            "n_pii": pa.array(n, pa.int64()),
        })

    return ds.map_batches(_scrub, batch_format="pyarrow",
                          zero_copy_batch=True)


def group_sample(sf_dir: str, n_per_group: int = 50,
                 num_buckets: int = 8):
    """Deterministic per-group quota sampling: the ``n_per_group`` docs
    per language smallest in (md5(normalized text), doc_id) order — the
    balanced-subset construction pass (equal docs per group regardless of
    corpus skew), RNG-free like :func:`stratified_sample` so the pick is
    reproducible across runs, engines and partitionings.

    Scale shape: each batch emits AT MOST n rows per lang (vectorized
    batch-local top-n — one Arrow sort + ragged rank per batch), so the
    single exchange carries ≤ n·langs·n_blocks 50-byte rows and one tiny
    per-bucket reduce takes the global n; the text never shuffles.
    Oracle: ``row_number() OVER (PARTITION BY lang ORDER BY md5, doc_id)
    <= n``."""
    import pyarrow.compute as pc

    from ..functions.text import normalize
    from ..util import hash_exchange

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def _topn(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[
            ("lang", "ascending"), ("fp", "ascending"),
            ("doc_id", "ascending")])
        t = t.take(order)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, langs[1:] != langs[:-1]])
        rank = np.arange(len(langs)) - np.repeat(
            starts, np.diff(np.r_[starts, len(langs)]))
        return t.filter(pa.array(rank < n_per_group))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "fp": pa.array([], pa.string())})
        return _topn(pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "lang": t["lang"],
            "fp": _md5_fps(normalize(t["text"])),
        }))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096)
    out = hash_exchange(parts, "lang", num_buckets, _topn, arrow=True)
    return out.drop_columns(["fp"])


def contamination_report(sf_dir: str, n: int = NGRAM_DECON_N,
                         eval_mod: int = EVAL_MOD):
    """Per-eval-doc contamination REPORT: for every held-out eval doc
    (the ``doc_id % eval_mod == 0`` stand-in), the fraction of its
    distinct token ``n``-grams that also occur in the training corpus —
    the measurement companion to :func:`decontaminate_ngram` (which
    drops): release notes report this table, per benchmark.

    Scale shape (both sides honest): the EVAL side is a fixed bounded
    benchmark suite — its per-doc distinct gram table gathers once
    driver-side and its gram SET broadcasts via ``ray.put``; the CORPUS
    side streams through one map_batches that emits only the grams it
    actually HIT (pre-uniqued per batch, ≤ |eval set| each) — the corpus
    text never shuffles and nothing corpus-sized lands anywhere. Final
    per-doc intersection counts are a vectorized driver pass over the
    bounded eval table. Docs with < n tokens carry no grams and emit no
    row (matching the oracle's empty-gram semantics)."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..util import dataset_to_arrow

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def _eval_doc_grams(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.int64)
        sub = t.filter(pa.array(ids % eval_mod == 0))
        g, di = _doc_ngrams(sub["text"], n)
        if not len(di):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "g": pa.array([], pa.string())})
        # per-doc distinct grams
        u = pa.table({"doc_id": pa.array(
            np.asarray(sub["doc_id"], np.int64)[di], pa.int64()),
            "g": g}).group_by(["doc_id", "g"]).aggregate([])
        return u

    ev = dataset_to_arrow(ds.map_batches(
        _eval_doc_grams, batch_format="pyarrow", zero_copy_batch=True))
    ev_set = pc.unique(ev["g"].combine_chunks()) if ev.num_rows else \
        pa.array([], pa.string())
    ref = ray.put(ev_set)

    def _hits(t: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        ids = np.asarray(t["doc_id"], np.int64)
        sub = t.filter(pa.array(ids % eval_mod != 0))  # corpus side only
        g, _ = _doc_ngrams(sub["text"], n)
        if not len(g):
            return empty
        u = pc.unique(g)
        hit = pc.is_in(u, value_set=ray.get(ref))
        return pa.table({"g": u.filter(hit)})

    hit_tbl = dataset_to_arrow(ds.map_batches(
        _hits, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4096))
    hits = (pc.unique(hit_tbl["g"].combine_chunks())
            if hit_tbl.num_rows else pa.array([], pa.string()))

    if ev.num_rows == 0:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
            "n_hit": pa.array([], pa.int64()),
            "frac": pa.array([], pa.float64())}))
    is_hit = pc.is_in(ev["g"].combine_chunks(), value_set=hits)
    agg = pa.table({
        "doc_id": ev["doc_id"],
        "h": pc.cast(is_hit, pa.int64()),
    }).group_by("doc_id").aggregate([([], "count_all"), ("h", "sum")])
    tot = agg["count_all"].to_numpy().astype(np.float64)
    nh = agg["h_sum"].to_numpy().astype(np.int64)
    frac = np.rint(nh / tot * 1e6) / 1e6
    return rd.from_arrow(pa.table({
        "doc_id": pc.cast(agg["doc_id"], pa.int64()),
        "n_grams": pc.cast(agg["count_all"], pa.int64()),
        "n_hit": pa.array(nh, pa.int64()),
        "frac": pa.array(frac, pa.float64()),
    }))
