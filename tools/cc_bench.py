"""A/B the two connected-components paths on an ER-shaped synthetic graph.

Usage: python tools/cc_bench.py [n_clusters] [mean_size]

Builds star+ring edges over Poisson-sized near-clique clusters (the shape
of an ER similarity graph: small diameter, dense blocks), then times
`connected_components` with the driver union-find forced on vs off.
Round-3 record (16 cpus, this box):

    3.1M edges / 1.68M nodes: driver 4.0 s, distributed 2.2 s
    10.2M edges / 5.40M nodes: driver 14.6 s, distributed 5.2 s

i.e. the delta min-label rewrite crossed over: the distributed path now
BEATS the driver path well below the driver's memory ceiling (round 2
measured 57.8 s distributed vs 9 s driver at 4.3M edges). The in-pipeline
default (`ERConfig.cc_driver_threshold`) stays at 8M edges because the
fused-from-scored driver extract amortizes differently, and at the
scaling corpus the difference is inside leg noise.
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ember_ray.stages.cluster import connected_components

    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    mean_sz = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    rng = np.random.default_rng(142)
    sizes = rng.poisson(mean_sz, n_clusters).clip(2, 24)
    srcs, dsts = [], []
    base = 0
    for sz in sizes:
        ids = np.arange(base, base + sz)
        srcs.append(np.repeat(ids[0], sz - 1))
        dsts.append(ids[1:])
        srcs.append(ids)
        dsts.append(np.roll(ids, 1))
        base += sz
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    print(f"edges={len(src):,} nodes={base:,}")
    tbl = pa.table({"src": pa.array(np.char.add("c", src.astype(str))),
                    "dst": pa.array(np.char.add("c", dst.astype(str)))})
    ds = rd.from_arrow(tbl).repartition(48).materialize()

    for label, thr in (("driver", 10**12), ("distributed", 0)):
        t0 = time.time()
        out = connected_components(ds, driver_threshold=thr).materialize()
        n = out.count()
        print(f"{label}: {time.time() - t0:.1f}s rows={n:,}")
    ray.shutdown()


if __name__ == "__main__":
    main()
