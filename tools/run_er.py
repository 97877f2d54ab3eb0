#!/usr/bin/env python
"""Cluster job entrypoint for the flagship ER pipeline (the north-rule
``ray job submit`` surface).

Submit against a running cluster (the job driver inherits the cluster
address; ``ray.init()`` with no address attaches to it):

    ray job submit --working-dir . -- \
        python tools/run_er.py --input /data/corpus --output /out/run1 \
            --config configs/base.json --set threshold=0.72 \
            --checkpoint-dir /out/run1/ckpt

or locally (owns its Ray session, like bench.py):

    python tools/run_er.py --input /root/testdata/../corpus --output /tmp/o

Reference analog: ``scripts/run_ali.py`` (the experiment runner CLI);
config layering mirrors its preset-over-base YAML pattern via
``registry.load_er_config`` (dicts/JSON/YAML, later layers win, unknown
keys raise). Outputs under ``--output``:

  * ``entities.parquet/``   multi-file partitioned entity assignment
  * ``metrics.json``        P/R/F1 (if gold present), stage timings,
                            oversize-drop stats, config echo — the K3/K5
                            artifact ``tools/report.py`` aggregates

Resume: pass the same ``--checkpoint-dir`` again; finished stages (and
finished partitions / mid-closure CC rounds) are skipped via the
content-derived lineage manifests in ``state/checkpoint.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# runnable from anywhere: repo root on sys.path (workers still need the
# driver cwd at the repo root — or a --working-dir upload — to import
# ember_ray inside map_batches; see CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_set(kvs: list[str]) -> dict:
    """``--set key=value`` overrides; values parse as JSON when they can
    (``threshold=0.72`` → float, ``use_idf=false`` → bool), else string."""
    out = {}
    for kv in kvs:
        if "=" not in kv:
            raise SystemExit(f"--set expects key=value, got {kv!r}")
        k, v = kv.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True,
                    help="transcripts parquet file/dir, or corpus dir "
                         "containing transcripts.parquet (+ optional "
                         "gold_clusters.parquet for evaluation)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--config", action="append", default=[],
                    help="ERConfig layer (.json/.yaml path); repeatable, "
                         "later layers override earlier ones")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="inline ERConfig override (repeatable, wins over "
                         "--config layers)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="enable per-stage/per-partition resume manifests")
    ap.add_argument("--no-gold", action="store_true",
                    help="skip evaluation even if gold_clusters.parquet "
                         "is present next to the input")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # under `ray job submit` this attaches to the cluster; standalone
        # it starts a local session (the only two call sites that own one
        # are CLI entry points like this and bench.py)
        ray.init(include_dashboard=False)

    from ember_ray.pipelines.er import run_er
    from ember_ray.registry import load_er_config
    from ember_ray.state.checkpoint import Checkpointer

    cfg = load_er_config(*args.config, _parse_set(args.set))
    ck = Checkpointer(args.checkpoint_dir) if args.checkpoint_dir else None

    # gold auto-detect fires only for corpus-DIR inputs; --no-gold opts
    # out via a gold-free symlink view of the corpus (transcripts.parquet
    # may itself be a directory of parts, so the view keeps the corpus-dir
    # shape and with it the fused parquet read path)
    src = args.input
    view = None
    if args.no_gold and os.path.isdir(src):
        inner = os.path.join(src, "transcripts.parquet")
        if os.path.exists(inner):
            import tempfile

            view = tempfile.mkdtemp(prefix="run_er_nogold_")
            os.symlink(os.path.abspath(inner),
                       os.path.join(view, "transcripts.parquet"))
            src = view
    out = run_er(src, cfg, checkpointer=ck)

    os.makedirs(args.output, exist_ok=True)
    ent_path = os.path.join(args.output, "entities.parquet")
    out["entities"].write_parquet(ent_path)

    from dataclasses import asdict

    metrics = {
        "input": args.input,
        "entities_path": ent_path,
        "timings": out.get("timings", {}),
        "oversize_stats": out.get("oversize_stats", {}),
        "config": asdict(cfg),
    }
    if "metrics" in out:
        metrics.update({k: v for k, v in out["metrics"].items()})
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, default=str)
    print(json.dumps({k: metrics[k] for k in metrics
                      if k not in ("config",)}, default=str))

    if view is not None:
        # outputs are fully written by now; drop the symlink view
        import shutil

        shutil.rmtree(view, ignore_errors=True)
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
