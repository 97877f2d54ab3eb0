"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exact baseline: the query matrix is tiny
and broadcast once (``ray.put``); each ``map_batches`` task does one numpy
matmul against its Arrow batch and emits only its LOCAL top-k per query
(partial top-k), so the driver-side final merge sees ``k × n_batches``
rows, never the full score matrix. The IVF-style scale path reuses the
sign-sketch LSH bucketing from ``dedup.dedup_embedding`` to probe only
matching buckets.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _vecs(t: pa.Table) -> np.ndarray:
    return np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)


def _round6(x: np.ndarray) -> np.ndarray:
    # rint(x·10^6)/10^6 matches DuckDB round(x*1000000)/1000000 exactly;
    # plain np.round(x, 6) differs by one ulp (CLAUDE.md gotcha).
    return np.rint(x * 1e6) / 1e6


def ann_topk(sf_dir: str, n_queries: int = 8, k: int = 10):
    """Exact cosine top-k of every query (vec_id < n_queries) against the
    whole table. Scores rounded to 6 dp (tie-break: vec_id asc) so the
    DuckDB oracle compares exactly."""
    import ray
    import ray.data as rd

    emb = _emb(sf_dir)
    qt = (
        emb.filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    qids = qt["vec_id"].to_numpy()
    Q = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qref = ray.put((qids, Qn))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        qids_, Qn_ = ray.get(qref)
        V = _vecs(t)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = _round6(Qn_ @ Vn.T)  # (n_queries, batch); round BEFORE top-k
        ids = np.asarray(t["vec_id"])
        kk = min(k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # deterministic top-k on the rounded score with vec_id tie-break,
            # matching the oracle's ORDER BY cosine DESC, vec_id
            idx = np.lexsort((ids, -sims[qi]))[:kk]
            out_q.append(np.full(kk, qids_[qi], np.int64))
            out_v.append(ids[idx])
            out_s.append(sims[qi][idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # final merge: k × n_batches rows — tiny
    df = parts.to_pandas()
    df = df.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    top = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return rd.from_pandas(top)


def ann_topk_lsh(sf_dir: str, n_queries: int = 8, k: int = 10, n_planes: int = 6):
    """Bucketed (LSH) approximate variant — probes only the query's
    sign-sketch bucket plus 1-bit neighbors; rows-only check (recall<1 by
    design)."""
    import ray
    import ray.data as rd

    emb = _emb(sf_dir)
    rng = np.random.default_rng(142)
    planes = rng.standard_normal((n_planes, 64))

    qt = emb.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    qids = qt["vec_id"].to_numpy()
    Q = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qsig = (Qn @ planes.T > 0).astype(np.uint8)
    qkeys = (qsig * (1 << np.arange(n_planes, dtype=np.uint8))).sum(axis=1)
    # probe set: own bucket + all 1-bit-flip neighbors
    probe: dict[int, list[int]] = {}
    for qi, key in enumerate(qkeys):
        ks = {int(key)} | {int(key) ^ (1 << b) for b in range(n_planes)}
        for kk_ in ks:
            probe.setdefault(kk_, []).append(qi)
    qref = ray.put((qids, Qn, probe))

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if t.num_rows == 0:
            return empty
        qids_, Qn_, probe_ = ray.get(qref)
        V = _vecs(t)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        bits = (Vn @ planes.T > 0).astype(np.uint8)
        keys = (bits * (1 << np.arange(n_planes, dtype=np.uint8))).sum(axis=1)
        ids = np.asarray(t["vec_id"])
        rows_q, rows_v, rows_s = [], [], []
        for key, qis in probe_.items():
            mask = keys == key
            if not mask.any():
                continue
            sub = Vn[mask]
            sub_ids = ids[mask]
            sims = Qn_[qis] @ sub.T
            kk = min(k, sims.shape[1])
            for row, qi in enumerate(qis):
                idx = np.argpartition(-sims[row], kk - 1)[:kk]
                rows_q.append(np.full(kk, qids_[qi], np.int64))
                rows_v.append(sub_ids[idx])
                rows_s.append(sims[row][idx])
        if not rows_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(rows_v), pa.int64()),
                "cosine": pa.array(_round6(np.concatenate(rows_s)), pa.float64()),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    df = parts.to_pandas().drop_duplicates(["query_id", "vec_id"])
    df = df.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    top = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return rd.from_pandas(top)
