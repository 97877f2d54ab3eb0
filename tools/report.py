#!/usr/bin/env python
"""Results report over checkpoint manifests + metrics files (K5 parity).

Reference analog: ``scripts/print_results:14-36`` — rglob ``metrics.json``
under a results root, flatten each into a CSV row, print to stdout. Here
the row sources are the engine's lineage artifacts:

  * stage manifests        ``stage=<s>/fp=<f>/manifest.json``
  * partition manifests    ``stage=<s>/fp=<f>/part=<k>.manifest.json``
  * run metrics            any ``metrics.json``

Usage: ``python tools/report.py <checkpoint_root> [...more roots]``
Pure driver-side reporting (small JSON files), no Ray session.
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path


def collect_rows(root: str) -> list[dict]:
    rows: list[dict] = []
    rootp = Path(root)
    for path in sorted(rootp.rglob("*.json")):
        name = path.name
        if not (name == "manifest.json" or name.endswith(".manifest.json")
                or name == "metrics.json"):
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            print(f"warning: skipping unreadable {path}: {e}", file=sys.stderr)
            continue
        if not isinstance(data, dict):
            continue
        row = {"path": str(path.relative_to(rootp)),
               "kind": ("metrics" if name == "metrics.json" else
                        "part_manifest" if name.endswith(".manifest.json")
                        and name != "manifest.json" else "stage_manifest")}
        # a data key named 'path'/'kind' must not clobber the synthesized
        # provenance columns — prefix it instead (ADVICE r2)
        row.update({(f"data_{k}" if k in ("path", "kind") else k): v
                    for k, v in data.items()})
        rows.append(row)
    return rows


def write_csv(rows: list[dict], out) -> None:
    """Union of keys as columns (reference print_results behavior —
    experiments may record different metric sets)."""
    cols = ["path", "kind"]
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    w = csv.DictWriter(out, fieldnames=cols, restval="")
    w.writeheader()
    for r in rows:
        w.writerow(r)


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    rows: list[dict] = []
    for root in argv:
        rows.extend(collect_rows(root))
    write_csv(rows, sys.stdout)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
