"""End-to-end gates: pairwise F1 >= 0.99 vs gold at the same blocking key
(BASELINE.json target) and partition-level resume without rescoring."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def er_cfg():
    from ember_ray.pipelines.er import ERConfig

    return ERConfig(
        num_perm=64,
        num_bands=16,
        max_block_size=64,
        threshold=0.7,
        scorer_concurrency=2,
        num_buckets=8,
        num_partitions=4,
        score_parts=4,
    )


def test_er_pipeline_f1(ray_session, e2e_corpus, er_cfg):
    from ember_ray.pipelines.er import run_er

    out = run_er(e2e_corpus, er_cfg)
    m = out["metrics"]
    assert m["tp"] + m["fn"] > 0, "fixture must contain gold-positive candidate pairs"
    assert m["f1"] >= 0.99, f"pairwise F1 gate failed: {m}"


def test_er_resume_skips_completed_partitions(ray_session, tiny_corpus, er_cfg, tmp_path):
    """Kill/resume semantics: after a completed run, invalidate 2 scoring
    partitions; the re-run must recompute ONLY those (manifest hits
    counted) and reproduce identical outputs."""
    from ember_ray.pipelines.er import run_er
    from ember_ray.state.checkpoint import Checkpointer

    root = str(tmp_path / "ckpt")
    ck1 = Checkpointer(root)
    out1 = run_er(tiny_corpus, er_cfg, checkpointer=ck1)
    scored1 = out1["scored"].to_pandas().sort_values(
        ["conv_id_left", "conv_id_right"]
    ).reset_index(drop=True)
    assert ck1.misses.get("score", 0) == er_cfg.score_parts

    # simulate a killed run: two partitions' manifests never landed
    score_dirs = glob.glob(os.path.join(root, "stage=score", "fp=*"))
    assert score_dirs
    removed = 0
    for p in (0, 1):
        m = os.path.join(score_dirs[0], f"part={p}.manifest.json")
        if os.path.exists(m):
            os.remove(m)
            shutil.rmtree(os.path.join(score_dirs[0], f"part={p}"), ignore_errors=True)
            removed += 1
    assert removed == 2

    ck2 = Checkpointer(root)
    out2 = run_er(tiny_corpus, er_cfg, checkpointer=ck2)
    # upstream stages: pure manifest hits, zero recompute
    assert ck2.hits.get("conversations") == 1 and ck2.misses.get("conversations", 0) == 0
    assert ck2.hits.get("pairs") == 1 and ck2.misses.get("pairs", 0) == 0
    # scoring: only the 2 invalidated partitions recomputed
    assert ck2.misses.get("score") == 2
    assert ck2.hits.get("score") == er_cfg.score_parts - 2

    scored2 = out2["scored"].to_pandas().sort_values(
        ["conv_id_left", "conv_id_right"]
    ).reset_index(drop=True)
    import pandas.testing as pdt

    pdt.assert_frame_equal(scored1, scored2)
    assert out1["metrics"]["f1"] == out2["metrics"]["f1"]


def test_manifest_contents(ray_session, tiny_corpus, er_cfg, tmp_path):
    from ember_ray.pipelines.er import run_er
    from ember_ray.state.checkpoint import Checkpointer

    root = str(tmp_path / "ck")
    run_er(tiny_corpus, er_cfg, checkpointer=Checkpointer(root))
    manifests = glob.glob(os.path.join(root, "**", "*.manifest.json"), recursive=True)
    stage_manifests = glob.glob(os.path.join(root, "**", "manifest.json"), recursive=True)
    assert len(manifests) == er_cfg.score_parts
    assert len(stage_manifests) >= 2
    m = json.load(open(manifests[0]))
    for key in ("stage", "partition_id", "input_fingerprint", "row_count", "wall_s"):
        assert key in m
    sm = json.load(open(stage_manifests[0]))
    for key in ("stage", "input_fingerprint", "row_count", "wall_s"):
        assert key in sm


def test_report_tool_over_checkpointed_run(ray_session, tiny_corpus, er_cfg,
                                           tmp_path):
    """K5 parity: tools/report.py rglobs manifests + metrics.json into one
    CSV (reference scripts/print_results:14-36)."""
    import csv
    import io

    from ember_ray.pipelines.er import run_er
    from ember_ray.state.checkpoint import Checkpointer
    from tools.report import collect_rows, write_csv

    root = str(tmp_path / "ck")
    out = run_er(tiny_corpus, er_cfg, checkpointer=Checkpointer(root))
    with open(os.path.join(root, "metrics.json"), "w") as f:
        json.dump(out["metrics"], f)

    rows = collect_rows(root)
    kinds = {r["kind"] for r in rows}
    assert kinds == {"stage_manifest", "part_manifest", "metrics"}
    assert sum(r["kind"] == "part_manifest" for r in rows) == er_cfg.score_parts
    buf = io.StringIO()
    write_csv(rows, buf)
    parsed = list(csv.DictReader(io.StringIO(buf.getvalue())))
    assert len(parsed) == len(rows)
    f1_rows = [r for r in parsed if r["kind"] == "metrics"]
    assert f1_rows and float(f1_rows[0]["f1"]) == pytest.approx(out["metrics"]["f1"])


def test_er_no_matches_all_singletons(ray_session, er_cfg):
    """A corpus with no near-duplicates: no edges survive, every
    conversation is its own entity, and the metric path doesn't divide by
    zero (empty-edge union-find + left-outer entity assignment)."""
    import ray.data as rd

    from ember_ray.pipelines.er import run_er

    rows = []
    for i in range(30):
        # pairwise-disjoint vocabularies → zero token overlap
        rows.append(
            {
                "conv_id": f"s{i:03d}",
                "turn_idx": 0,
                "role": "user",
                "text": " ".join(f"w{i}_{j}" for j in range(12)),
                "tool": "",
                "ts": None,
            }
        )
    ds = rd.from_items(rows)
    gold = rd.from_items(
        [{"conv_id": f"s{i:03d}", "cluster_id": i} for i in range(30)]
    )
    out = run_er(ds, er_cfg, gold=gold)
    ents = out["entities"].to_pandas()
    assert len(ents) == 30
    assert (ents["conv_id"] == ents["entity_id"]).all()
    m = out["metrics"]
    assert m["tp"] == 0 and m["fn"] == 0 and m["fp"] == 0
    assert m["f1"] == 0.0  # degenerate-by-construction, must not raise


def test_pack_hash_list_roundtrip(ray_session):
    """pack_hash_list → unpack_hash_bin reproduces the exact
    hash_list_arrays (values, offsets) the scorer kernels consume,
    including through a table slice (exchange buckets carry offsets)."""
    import numpy as np
    import pyarrow as pa

    from ember_ray.functions.minhash import hash_list_arrays
    from ember_ray.stages.pairs import pack_hash_list, unpack_hash_bin

    lists = [[1, 2, 3], [], [2**63, 7], [5]]
    col = pa.array(lists, pa.list_(pa.uint64()))
    packed = pack_hash_list(col, np.uint64)
    v0, o0 = hash_list_arrays(col)
    v1, o1 = unpack_hash_bin(packed, np.uint64)
    rows0 = [v0[o0[i]:o0[i + 1]].tolist() for i in range(len(lists))]
    rows1 = [v1[o1[i]:o1[i + 1]].tolist() for i in range(len(lists))]
    assert rows0 == rows1 == [list(map(int, r)) for r in lists]
    # sliced (bucket-slice analog): decode must window the offsets
    t = pa.table({"b": packed}).slice(1, 2)
    v2, o2 = unpack_hash_bin(t["b"], np.uint64)
    rows2 = [v2[o2[i]:o2[i + 1]].tolist() for i in range(2)]
    assert rows2 == [[], [2**63, 7]]
    # int32 variant (the ttf payload)
    ci = pa.array([[3, 1], [2]], pa.list_(pa.int32()))
    vi, oi = unpack_hash_bin(pack_hash_list(ci, np.int32), np.int32)
    assert [vi[oi[i]:oi[i + 1]].tolist() for i in range(2)] == [[3, 1], [2]]


def test_er_join_attach_path_parity(ray_session, tiny_corpus, er_cfg,
                                    monkeypatch):
    """Forcing the giant-corpus bucketed-join attach (broadcast threshold
    0 → no side index, pool killed, compact binary-packed payload) must
    produce bitwise-identical scores and identical entities to the
    default broadcast-index path."""
    import ember_ray.pipelines.er as er

    base = er.run_er(tiny_corpus, er_cfg)
    ref = (base["scored"].to_pandas()
           .sort_values(["conv_id_left", "conv_id_right"])
           .reset_index(drop=True))

    monkeypatch.setattr(er, "ATTACH_BROADCAST_THRESHOLD", 0)
    out = er.run_er(tiny_corpus, er_cfg)
    got = (out["scored"].to_pandas()
           .sort_values(["conv_id_left", "conv_id_right"])
           .reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[ref.columns], ref, check_exact=True)
    assert out["metrics"]["f1"] == base["metrics"]["f1"]


def test_run_er_cli_entrypoint(ray_session, tiny_corpus, tmp_path):
    """The `ray job submit` surface (tools/run_er.py): in-process main()
    attaches to the live session (owns_session False → no shutdown),
    writes entities.parquet + metrics.json with P/R/F1, timings, config
    echo and checkpoint manifests; --set overrides reach ERConfig; a
    second identical invocation resumes from the same checkpoint root."""
    from tools.run_er import main

    out = str(tmp_path / "out")
    rc = main(["--input", tiny_corpus, "--output", out,
               "--checkpoint-dir", os.path.join(out, "ckpt"),
               "--set", "score_parts=4", "--set", "threshold=0.7"])
    assert rc == 0
    m = json.load(open(os.path.join(out, "metrics.json")))
    assert {"f1", "precision", "recall", "timings", "config"} <= set(m)
    assert m["config"]["score_parts"] == 4
    assert m["config"]["threshold"] == 0.7
    assert os.path.isdir(os.path.join(out, "entities.parquet"))
    assert os.path.isdir(os.path.join(out, "ckpt"))

    # resume: second run against the same checkpoint root stays green
    assert main(["--input", tiny_corpus, "--output", out,
                 "--checkpoint-dir", os.path.join(out, "ckpt"),
                 "--set", "score_parts=4", "--set", "threshold=0.7"]) == 0

    # --no-gold view: no eval keys, entities still written
    out2 = str(tmp_path / "out2")
    assert main(["--input", tiny_corpus, "--output", out2,
                 "--no-gold", "--set", "score_parts=4"]) == 0
    m2 = json.load(open(os.path.join(out2, "metrics.json")))
    assert "f1" not in m2
    assert os.path.isdir(os.path.join(out2, "entities.parquet"))
