import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(ray_session):
    """Small deterministic synthetic corpus dir (transcripts + gold)."""
    from ember_ray.synth import SynthConfig, ensure_corpus

    cfg = SynthConfig(n_clusters=12, max_cluster_size=4, distractors_per_cluster=1,
                      n_singletons=6, seed=7)
    return ensure_corpus(cfg)


@pytest.fixture(scope="session")
def e2e_corpus(ray_session):
    """Corpus sized for the F1>=0.99 end-to-end gate."""
    from ember_ray.synth import SynthConfig, ensure_corpus

    cfg = SynthConfig(n_clusters=40, max_cluster_size=5, distractors_per_cluster=2,
                      n_singletons=20, seed=142)
    return ensure_corpus(cfg)
