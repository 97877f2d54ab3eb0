"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "pairs_scored": P, "pairs_scored_per_sec": R}

``--scaling``: runs the same benchmark twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input (the sandbox stand-in for
N vs 4N Ray nodes) and prints both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _warm_cache(sf_dir: str):
    for name in ("lineitem", "orders", "customer", "documents", "events",
                 "embeddings"):
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            with open(p, "rb") as f:
                while f.read(1 << 22):
                    pass


def run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from ember_ray.pipelines import ann, dedup, relational
    from ember_ray.pipelines.er import ERConfig, run_er
    from ember_ray.synth import SynthConfig, ensure_corpus

    _warm_cache(sf_dir)

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # --- flagship: full ER pipeline on a bench-scale synthetic corpus -----
    sf = 0.1
    try:
        import re

        m = re.search(r"sf([0-9.]+)", sf_dir)
        if m:
            sf = float(m.group(1))
    except Exception:
        pass
    n_clusters = max(50, int(8000 * sf))
    corpus = ensure_corpus(
        SynthConfig(n_clusters=n_clusters, max_cluster_size=5,
                    distractors_per_cluster=2,
                    n_singletons=n_clusters // 2, seed=142)
    )
    cfg = ERConfig(
        scorer_concurrency=max(2, num_cpus // 4),
        num_buckets=max(16, num_cpus * 2),
        num_partitions=max(8, num_cpus),
        score_parts=16,
    )
    er_out = timed("er_pipeline", lambda: run_er(corpus, cfg))
    pairs_scored = er_out["scored"].count()

    # --- wide relational operators over the driver tables ------------------
    timed("pricing_summary",
          lambda: relational.pricing_summary(sf_dir).to_pandas())
    timed("join_agg", lambda: relational.join_agg(sf_dir).to_pandas())
    timed("assembly", lambda: relational.assembly(sf_dir).count())
    timed("topk", lambda: relational.topk(sf_dir).to_pandas())

    # --- training-data ops --------------------------------------------------
    timed("dedup_exact", lambda: dedup.dedup_exact(sf_dir).count())
    timed("dedup_minhash", lambda: dedup.dedup_minhash(sf_dir).count())
    timed("ann_topk", lambda: ann.ann_topk(sf_dir).count())

    ray.shutdown()

    total = round(sum(timings.values()), 3)
    er_sec = timings["er_pipeline"]
    return {
        "metric": "ember_ray headline pipelines (ER + relational + dedup + ann)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": num_cpus,
        "pairs_scored": int(pairs_scored),
        "pairs_scored_per_sec": round(pairs_scored / er_sec, 1) if er_sec else None,
        "f1": round(er_out["metrics"]["f1"], 4) if "metrics" in er_out else None,
    }


def run_scaling() -> dict:
    def run_at(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run_at(lo)
    r_hi = run_at(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (num_cpus 8 vs 32, fresh processes)",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "throughput_8_pairs_per_sec": r_lo.get("pairs_scored_per_sec"),
        "throughput_32_pairs_per_sec": r_hi.get("pairs_scored_per_sec"),
        "er_sec_8": r_lo["queries"]["er_pipeline"],
        "er_sec_32": r_hi["queries"]["er_pipeline"],
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks(SF_DIR, NUM_CPUS)))
