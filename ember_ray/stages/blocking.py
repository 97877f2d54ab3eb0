"""Blocking: conversations + tokens → (block_key, conv_id) membership rows.

Replaces the reference's unscalable all-pairs cluster-profile comparison
(top-12-similar-clusters blocking, ``build_ali_dataset.py:36,133-217``)
with MinHash-LSH band keys (SURVEY.md §7.1 step 3): two conversations share
a band key with probability ≈ 1−(1−J^r)^b for token-Jaccard J, so
Jaccard-similar records co-locate under ``groupby(block_key)`` without any
global pairwise scan.

Stateless ``map_batches`` over zero-copy Arrow; the per-batch kernel is
numpy over pre-hashed tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.minhash import lsh_band_keys, minhash_signatures


def make_blocks_task(tbl: pa.Table, num_perm: int, num_bands: int,
                     seed: int) -> pa.Table:
    """``make_blocks(hashed=True)`` as ONE raw-task kernel over a whole
    conversation block — run via ``ray.remote`` per materialized conv
    block so the pair exchange's splits chain directly on the outputs (no
    Data job, no barrier). Fusing the MinHash INTO the assembly reduce
    was measured WORSE (+9 s at 16 cpus: the reduces are already
    bandwidth-saturated by concat+sort+join; the permutation matmuls
    inflate super-linearly there), so blocking keeps its own execution
    window."""
    from ..functions.minhash import _minhash_from_hashes, hash_list_arrays
    from ..util import stable_hash64

    if tbl.num_rows == 0:
        return pa.table({"block_key": pa.array([], pa.uint64()),
                         "cid": pa.array([], pa.uint64())})
    h, off = hash_list_arrays(tbl["thash"])
    sig = _minhash_from_hashes(h, off, num_perm, seed)
    keys = lsh_band_keys(sig, num_bands)
    cid = stable_hash64(tbl["conv_id"])
    return pa.table(
        {
            "block_key": pa.array(keys.ravel(), pa.uint64()),
            "cid": pa.array(np.repeat(cid, num_bands), pa.uint64()),
        }
    )


def explode_bands(tbl: pa.Table) -> pa.Table:
    """One conversation block WITH a precomputed ``bands`` column
    (fixed_size_list<uint64>, from ``assemble_conversations(bands=...)``)
    → BLOCKS rows ``(block_key, cid)``. Pure reshape — run as a raw Ray
    task per conversation block so the pair exchange's split tasks chain
    directly on its outputs with no Data job or barrier in between."""
    from ..util import stable_hash64

    if tbl.num_rows == 0:
        return pa.table({"block_key": pa.array([], pa.uint64()),
                         "cid": pa.array([], pa.uint64())})
    col = tbl["bands"]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    nb = col.type.list_size
    keys = np.asarray(col.flatten(), dtype=np.uint64)  # slice-safe
    cid = stable_hash64(tbl["conv_id"])
    return pa.table(
        {
            "block_key": pa.array(keys, pa.uint64()),
            "cid": pa.array(np.repeat(cid, nb), pa.uint64()),
        }
    )


def make_blocks(
    conversations,
    num_perm: int = 64,
    num_bands: int = 16,
    seed: int = 142,
    hashed: bool = False,
):
    """conversations (needs ``conv_id`` + ``tokens``) → BLOCKS dataset.

    ``hashed=True`` emits ``cid = stable_hash64(conv_id)`` (uint64)
    instead of the conv_id string: the entire pair path (two exchanges +
    dedup sorts) then moves 16 B/pair of numeric keys instead of ~40-50 B
    of strings — the strings are recovered at score time from the sharded
    broadcast index (``util.hash_sharded_lookup``), whose build rejects
    hash collisions exactly."""

    def fn(batch: pa.Table) -> pa.Table:
        if "thash" in batch.schema.names:
            # precomputed per-conv unique token hashes: identical
            # signatures (minhash is set-invariant) without re-tokenizing
            # or re-hashing the corpus
            from ..functions.minhash import (_minhash_from_hashes,
                                             hash_list_arrays)

            h, off = hash_list_arrays(batch["thash"])
            sig = _minhash_from_hashes(h, off, num_perm, seed)
        else:
            sig = minhash_signatures(batch["tokens"], num_perm=num_perm,
                                     seed=seed)
        keys = lsh_band_keys(sig, num_bands=num_bands)  # (n, bands) uint64
        conv = batch["conv_id"].combine_chunks() if isinstance(
            batch["conv_id"], pa.ChunkedArray
        ) else batch["conv_id"]
        n = keys.shape[0]
        idx = np.repeat(np.arange(n), num_bands)
        if hashed:
            from ..util import stable_hash64

            cid = stable_hash64(conv)
            return pa.table(
                {
                    "block_key": pa.array(keys.ravel(), pa.uint64()),
                    "cid": pa.array(cid[idx], pa.uint64()),
                }
            )
        return pa.table(
            {
                "block_key": pa.array(keys.ravel(), pa.uint64()),
                "conv_id": conv.take(pa.array(idx)),
            }
        )

    # batch_size=4096: measured 2× faster than Ray's 1024 default for this
    # kernel (fewer per-batch fixed costs; the in-place minhash buffer
    # keeps memory flat regardless of batch size)
    sch = conversations.schema()
    tok_col = "thash" if sch is not None and "thash" in sch.names else "tokens"
    return conversations.select_columns(["conv_id", tok_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096
    )
