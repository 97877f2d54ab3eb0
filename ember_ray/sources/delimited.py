"""Multi-character-delimiter CSV source (reference S1).

The reference ingests its raw corpus with
``pd.read_csv(sep="@;@", header=None, names=[...], engine="python")``
(``scripts/construction/build_ali_corpus.py:16-22``) — a Python-engine
row loop. ``ray.data.read_csv`` (Arrow CSV) only takes single-byte
separators, so the Ray-native equivalent is ``read_text`` (streaming,
one block per file chunk) + a vectorized Arrow splitter in
``map_batches``: ``pc.split_pattern`` + ``pc.list_element`` per column —
no Python-level row iteration, scales with the byte stream.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def read_multichar_delimited(
    paths,
    sep: str,
    names: list[str],
    types: dict[str, pa.DataType] | None = None,
):
    """Read line-oriented text files with a multi-character field separator.

    Args:
        paths: file path(s) passed to ``ray.data.read_text``.
        sep: multi-char separator (e.g. ``"@;@"``).
        names: column names in field order (header-less, like the reference).
        types: optional per-column Arrow types to cast to (default: string).
    """
    import ray.data as rd

    ds = rd.read_text(paths)
    n = len(names)

    # ragged-row padding: a line with k < n fields gets (n-k) separators
    # appended so every row splits into exactly n fields (missing → "");
    # rows with extra separators keep the overflow in the last field via
    # max_splits (pandas engine="python" raises there; "" → null here).
    pad_lookup = pa.array([sep * k for k in range(n + 1)], pa.string())

    def split(batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        nfields = pc.add(
            pc.count_substring(lines, pattern=sep), 1
        )
        deficit = pc.max_element_wise(pc.subtract(n, nfields), 0)
        pad = pc.take(pad_lookup, deficit)
        lines = pc.binary_join_element_wise(lines, pad, "")
        parts = pc.split_pattern(lines, pattern=sep, max_splits=n - 1)
        cols = {}
        for i, name in enumerate(names):
            col = pc.list_element(parts, i)
            if types and name in types:
                t = types[name]
                # empty string → null before numeric cast
                if not pa.types.is_string(t):
                    col = pc.if_else(pc.equal(col, ""), pa.nulls(len(col), pa.string()), col)
                col = pc.cast(col, t)
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
