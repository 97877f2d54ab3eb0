"""Side-channel skew/drop statistics (VERDICT r3 #4).

Oversize-block policies (stop-key ``drop``, deterministic ``salt`` split)
are sound skew guards, but a mis-tuned ``max_block_size`` at scale would
otherwise delete candidates with no observable signal. Kernels report
every oversize event to a tiny named zero-CPU counter actor; pipelines
snapshot it into their result dicts and tests assert it fires on planted
hot keys.

The actor is detached + named so concurrent exchange reduce tasks share
one counter without plumbing handles through every kernel closure (the
report is fire-and-forget and only happens on oversize events, which are
rare by design — zero cost on the clean path).
"""

from __future__ import annotations

_NAME = "ember_ray_drop_stats"
_NAMESPACE = "ember_ray"


_CLS_CACHE = []


def _actor_cls():
    import ray

    if _CLS_CACHE:  # wrap with ray.remote once per process (export cost)
        return _CLS_CACHE[0]

    @ray.remote(num_cpus=0)
    class DropStats:
        """stage -> {blocks, rows, policy} cumulative counters."""

        def __init__(self):
            self._c: dict[str, dict[str, int | str]] = {}

        def add(self, stage: str, n_blocks: int, n_rows: int, policy: str):
            e = self._c.setdefault(
                stage, {"blocks": 0, "rows": 0, "policy": policy})
            e["blocks"] += int(n_blocks)
            e["rows"] += int(n_rows)
            e["policy"] = policy

        def get(self) -> dict:
            return {k: dict(v) for k, v in self._c.items()}

        def reset(self):
            self._c = {}

    _CLS_CACHE.append(DropStats)
    return DropStats


def stats_actor():
    """Get-or-create the shared counter actor (race-safe across tasks)."""
    return _actor_cls().options(
        name=_NAME, namespace=_NAMESPACE, get_if_exists=True,
        lifetime="detached",
    ).remote()


def report_oversize(stage: str, n_blocks: int, n_rows: int,
                    policy: str) -> None:
    """Record that ``n_blocks`` oversize blocks (``n_rows`` member rows)
    were handled by ``policy`` ('drop' = candidates lost, 'salt' = split).
    Called from exchange reduce tasks; fire-and-forget."""
    if n_blocks <= 0:
        return
    stats_actor().add.remote(stage, n_blocks, n_rows, policy)


def drop_counts() -> dict:
    """Snapshot of cumulative per-stage oversize counters."""
    import ray

    return ray.get(stats_actor().get.remote())


def reset_drop_counts() -> None:
    import ray

    ray.get(stats_actor().reset.remote())
