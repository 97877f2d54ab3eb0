"""Sinks (reference K1/K2): partitioned Parquet + CSV.

K1: ``df.to_parquet`` per split (``build_ali_corpus.py:28``,
``build_ali_dataset.py:360-364``) → ``ds.write_parquet`` here, but
partitioned by a content-derived column so output is resumable at
partition granularity (one directory per partition; a failed run skips
directories whose manifest exists — see ``state/checkpoint.py``).

K2: ``scripts/dm.py:262-266`` parquet→CSV conversion → ``ds.write_csv``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def write_partitioned_parquet(
    ds,
    path: str,
    partition_key: str | None = None,
    num_partitions: int = 16,
):
    """Write a Dataset as hive-partitioned Parquet (``part=<i>/`` dirs).

    The partition id is ``stable_hash(partition_key) % num_partitions``
    (content-derived, parallelism-independent) so re-runs at any cluster
    size produce the same layout and can skip finished partitions.
    """
    if partition_key is None:
        ds.write_parquet(path)
        return

    from ..util import bucket_of

    def tag(batch: pa.Table) -> pa.Table:
        part = bucket_of(batch[partition_key], num_partitions)
        return batch.append_column("part", pa.array(part.astype(np.int64), pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        path, partition_cols=["part"]
    )


def write_csv(ds, path: str):
    """CSV sink (reference K2, dm.py:262-266)."""
    ds.write_csv(path)
