"""JSON-lines source, gzip included (reference S4).

The reference reads WDC train/test with ``pd.read_json(path, lines=True)``
over ``.json.gz`` files (``src/datamodules/wdcdatamodule.py:79,93-96``).
Ray-native: ``ray.data.read_json`` handles newline-delimited JSON and
gzip via ``arrow_open_stream_args``; nested struct columns the reference
strips (``wdcdatamodule.py:62-73``) can be dropped at read time with
``columns=``-style projection after load.
"""

from __future__ import annotations


def read_jsonl(paths, drop_columns: list[str] | None = None):
    """Read (optionally gzipped) newline-delimited JSON into a Dataset."""
    import ray.data as rd

    kwargs = {}
    p0 = paths[0] if isinstance(paths, (list, tuple)) else paths
    if str(p0).endswith(".gz"):
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
    ds = rd.read_json(paths, **kwargs)
    if drop_columns:
        present = [c for c in drop_columns if c in ds.schema().names]
        if present:
            ds = ds.drop_columns(present)
    return ds
