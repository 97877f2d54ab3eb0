"""Pluggable stage registry + config layering (SURVEY §2.11, VERDICT r3
#8): a custom scorer/blocker swaps in through ERConfig strings only.

The custom stage classes are defined INSIDE the tests: cloudpickle then
serializes them by value, so Ray workers never need to import the test
module (module-scope definitions in tests/ are not importable from
workers and would wedge the actor pool in a restart loop).
"""

import json

import pyarrow as pa
import pytest


def _make_exact_text_scorer():
    class ExactTextScorer:
        """Minimal registry-scorer-protocol class: score 1.0 iff the two
        sides' texts are byte-identical."""

        def __init__(self, idf_ref=None, weights=None):
            self.idf_ref = idf_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            eq = pc.equal(batch["text_left"], batch["text_right"])
            return pa.table({
                "conv_id_left": batch["conv_id_left"],
                "conv_id_right": batch["conv_id_right"],
                "score": pc.if_else(eq, 1.0, 0.0),
            })

    return ExactTextScorer


def _first_token_blocker(conversations, cfg):
    """Minimal registry-blocker-protocol fn: block on the first
    whitespace token of the conversation text."""
    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        first = pc.list_element(
            pc.split_pattern(pc.utf8_lower(t["text"]), " "), 0)
        return pa.table({"block_key": first, "conv_id": t["conv_id"]})

    return conversations.map_batches(fn, batch_format="pyarrow",
                                     zero_copy_batch=True)


def test_config_layering(tmp_path):
    from ember_ray.registry import load_er_config

    preset = tmp_path / "preset.json"
    preset.write_text(json.dumps({"threshold": 0.9, "num_bands": 8}))
    cfg = load_er_config({"num_perm": 32, "threshold": 0.5}, str(preset),
                         {"scorer": "exact_text"})
    assert cfg.num_perm == 32          # base survives
    assert cfg.threshold == 0.9        # later layer wins
    assert cfg.num_bands == 8
    assert cfg.scorer == "exact_text"

    with pytest.raises(KeyError, match="unknown ERConfig keys"):
        load_er_config({"not_a_field": 1})


def test_resolve_unknown_name():
    from ember_ray.registry import resolve

    with pytest.raises(KeyError, match="registered:"):
        resolve("scorer", "nope")
    assert resolve("scorer", "pair_features") is not None


def test_custom_scorer_through_config_only(ray_session, tiny_corpus):
    """run_er with scorer='exact_text': the custom class is resolved from
    the registry and scores every candidate pair 0/1 — no pipeline-code
    edits (the §2.11 'done' criterion)."""
    from ember_ray.pipelines.er import ERConfig, run_er
    from ember_ray.registry import _REGISTRIES, register

    register("scorer", "exact_text")(_make_exact_text_scorer())
    try:
        cfg = ERConfig(scorer="exact_text", scorer_concurrency=2,
                       num_buckets=8, num_partitions=4)
        out = run_er(tiny_corpus, cfg)
        scored = out["scored"].to_pandas()
        assert len(scored) > 0
        assert set(scored["score"].unique()) <= {0.0, 1.0}
        assert out["entities"].count() > 0
    finally:
        _REGISTRIES["scorer"].pop("exact_text", None)


def test_custom_blocker_through_config_only(ray_session, tiny_corpus):
    from ember_ray.pipelines.er import ERConfig, run_er
    from ember_ray.registry import _REGISTRIES, register

    register("blocker", "first_token")(_first_token_blocker)
    try:
        cfg = ERConfig(blocker="first_token", scorer_concurrency=2,
                       num_buckets=8, num_partitions=4, max_block_size=256)
        out = run_er(tiny_corpus, cfg)
        scored = out["scored"].to_pandas()
        assert len(scored) > 0
        # built-in scorer still produced its full feature schema
        assert {"jaccard", "jaro_winkler", "levenshtein", "score"} <= set(
            scored.columns)
        assert out["entities"].count() > 0
    finally:
        _REGISTRIES["blocker"].pop("first_token", None)
