"""Per-stage / per-partition Parquet checkpoints with lineage manifests.

The reference has NO construction-time resume (SURVEY.md §4: "crash ⇒
rerun script"); its only checkpointing is model weights
(``src/models/matcher.py:53-58``). The north star requires more: "every
stage checkpoints per-partition Parquet state with lineage manifests
(partition id, input fingerprint, row counts, stage metrics) so a killed
run resumes mid-pipeline without rescoring completed blocks".

Design:
  * Fingerprints are CONTENT-derived — sha256 over (stage config, upstream
    fingerprint) — never RNG/time-derived, so a resumed run and a run at a
    different parallelism level make identical skip decisions
    (SURVEY.md §7.3 "Checkpoint fingerprints").
  * Stage-level: ``run(stage, fp, compute)`` → if ``<root>/<stage>/<fp>/
    manifest.json`` exists, stream the saved Parquet back; else compute,
    write to a temp dir, atomically rename, then write the manifest.
  * Partition-level (for the expensive scoring stage): partitions are
    content-hash-derived (``hash(pair) % P``); each completed partition has
    its own dir + manifest; a resumed run recomputes only missing ones.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable


def fingerprint(*parts) -> str:
    """Stable content fingerprint of JSON-serializable parts."""
    return hashlib.sha256(
        json.dumps(parts, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class Checkpointer:
    """Tracks hits/misses so tests can assert "completed work not redone"."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.hits: dict[str, int] = {}
        self.misses: dict[str, int] = {}

    # ------------------------------------------------------------ stage level
    def stage_dir(self, stage: str, fp: str) -> str:
        return os.path.join(self.root, f"stage={stage}", f"fp={fp}")

    def run(self, stage: str, fp: str, compute: Callable[[], "object"]):
        """compute() → Dataset, checkpointed at stage granularity."""
        import ray.data as rd

        d = self.stage_dir(stage, fp)
        manifest = os.path.join(d, "manifest.json")
        data = os.path.join(d, "data")
        if os.path.exists(manifest):
            self.hits[stage] = self.hits.get(stage, 0) + 1
            return rd.read_parquet(data)
        self.misses[stage] = self.misses.get(stage, 0) + 1
        t0 = time.monotonic()
        ds = compute()
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        ds.write_parquet(os.path.join(tmp, "data"))
        out = rd.read_parquet(os.path.join(tmp, "data"))
        rows = out.count()
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "input_fingerprint": fp,
                    "row_count": rows,
                    "wall_s": time.monotonic() - t0,
                },
                f,
            )
        if os.path.exists(d):
            shutil.rmtree(d)
        os.replace(tmp, d)
        return rd.read_parquet(data)

    # -------------------------------------------------------- partition level
    def part_dir(self, stage: str, fp: str, part: int) -> str:
        return os.path.join(self.stage_dir(stage, fp), f"part={part}")

    def completed_parts(self, stage: str, fp: str, num_parts: int) -> set[int]:
        # manifests sit NEXT to the data dir (``part=k.manifest.json``) so the
        # data dir stays pure Parquet for read_parquet
        done = set()
        for p in range(num_parts):
            if os.path.exists(self.part_dir(stage, fp, p) + ".manifest.json"):
                done.add(p)
        return done

    def commit_part(self, stage: str, fp: str, part: int, tmp_data_dir: str,
                    row_count: int, wall_s: float, **metrics):
        """Atomically move a finished partition's data dir into place and
        write its manifest (partition id + lineage + stage metrics)."""
        d = self.part_dir(stage, fp, part)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        os.replace(tmp_data_dir, d)
        with open(d + ".manifest.json", "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "partition_id": part,
                    "input_fingerprint": fp,
                    "row_count": row_count,
                    "wall_s": wall_s,
                    **metrics,
                },
                f,
            )

    def part_data_dirs(self, stage: str, fp: str, num_parts: int) -> list[str]:
        return [self.part_dir(stage, fp, p) for p in range(num_parts)]
