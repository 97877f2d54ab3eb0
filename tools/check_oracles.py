"""Local stand-in for the driver's correctness gate: run every queries()
entry at the given sf_dir and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive values).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def compare(name, got, want) -> str:
    import pandas as pd

    if sorted(got.columns) != sorted(want.columns):
        return f"SCHEMA got={sorted(got.columns)} want={sorted(want.columns)}"
    if len(got) != len(want):
        return f"ROWS got={len(got)} want={len(want)}"
    cols = sorted(want.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    w = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    try:
        # check_exact: the driver's gate hashes values BITWISE — the default
        # float tolerance here once masked a float32-oracle bug (VERDICT r2
        # #1). Exact compare when both sides are already float64; tolerance
        # only when one side is a narrower dtype by construction.
        exact = all(
            str(g[c].dtype) == "float64" and str(w[c].dtype) == "float64"
            or not pd.api.types.is_float_dtype(w[c])
            for c in cols
        )
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=exact)
    except AssertionError as e:
        return "VALUES " + str(e).splitlines()[0]
    return "OK"


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:22s} ERROR {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name in oracles:
            want = con.execute(oracles[name]).df()
            verdict = compare(name, got, want)
        else:
            verdict = f"rows-only ({len(got)} rows)"
        status = verdict if verdict.startswith(("OK", "rows-only")) else "FAIL " + verdict
        if status.startswith("FAIL"):
            failures += 1
        print(f"{name:22s} {dt:6.1f}s  {status[:160]}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
