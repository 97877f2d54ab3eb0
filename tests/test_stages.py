"""Stage-level tests over tiny in-memory datasets (session-scoped Ray)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_assembly_per_turn_text_equality(rd, tiny_corpus):
    """BASELINE.json invariant: turns concatenated byte-identical in stable
    turn_idx order (rows arrive shuffled on disk)."""
    from ember_ray.stages.assemble import assemble_conversations

    raw = pq.read_table(f"{tiny_corpus}/transcripts.parquet")
    ds = rd.read_parquet(f"{tiny_corpus}/transcripts.parquet")
    convs = assemble_conversations(ds, num_buckets=8).to_pandas()

    df = raw.to_pandas()
    expect = (
        df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .groupby("conv_id")["text"]
        .agg("\n".join)
    )
    got = convs.set_index("conv_id")["text"]
    assert len(got) == len(expect)
    for cid in expect.index:
        assert got[cid] == expect[cid]  # byte-exact
    nt = df.groupby("conv_id")["turn_idx"].size()
    assert (convs.set_index("conv_id")["n_turns"].sort_index() == nt.sort_index()).all()


def test_assembly_fused_parquet_path_matches_dataset(rd, tiny_corpus):
    """The fused read+split exchange (str path input) must be byte-equal
    to the Dataset-input path, including the thash/ttf token columns."""
    from ember_ray.stages.assemble import assemble_conversations

    path = f"{tiny_corpus}/transcripts.parquet"
    via_ds = assemble_conversations(
        rd.read_parquet(path), num_buckets=8, tokenizer="word",
        token_hashes=True).to_pandas()
    via_path = assemble_conversations(
        path, num_buckets=8, tokenizer="word", token_hashes=True).to_pandas()
    a = via_ds.sort_values("conv_id", kind="mergesort").reset_index(drop=True)
    b = via_path.sort_values("conv_id", kind="mergesort").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype == object and len(a) and isinstance(av[0], np.ndarray):
            assert all(np.array_equal(x, y) for x, y in zip(av, bv))
        else:
            assert (av == bv).all()


def test_tokenize_stage(rd):
    from ember_ray.stages.tokenize import add_tokens

    ds = rd.from_items([{"conv_id": "a", "text": "Hello, World k#:#v"}])
    out = add_tokens(ds).take_all()
    assert out[0]["tokens"] == ["hello", "world", "k", "v"]


def test_blocking_near_dups_share_block(rd):
    from ember_ray.stages.blocking import make_blocks
    from ember_ray.stages.tokenize import add_tokens

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(57)) + " zz1 zz2 zz3"
    far = " ".join(f"other{i}" for i in range(60))
    ds = rd.from_items(
        [
            {"conv_id": "a", "text": base},
            {"conv_id": "b", "text": near},
            {"conv_id": "c", "text": far},
        ]
    )
    blocks = make_blocks(add_tokens(ds), num_perm=64, num_bands=16).to_pandas()
    by_key = blocks.groupby("block_key")["conv_id"].agg(set)
    assert any(v >= {"a", "b"} for v in by_key.values)
    assert not any(v >= {"a", "c"} for v in by_key.values)


def test_pair_generation_cap_and_dedup(rd):
    from ember_ray.stages.pairs import generate_pairs

    rows = []
    # block X: 3 members → 3 pairs; block Y repeats one pair (dedup);
    # block Z: 5 members with cap 4 → dropped entirely
    for cid in ["a", "b", "c"]:
        rows.append({"block_key": "X", "conv_id": cid})
    for cid in ["a", "b"]:
        rows.append({"block_key": "Y", "conv_id": cid})
    for cid in ["p", "q", "r", "s", "t"]:
        rows.append({"block_key": "Z", "conv_id": cid})
    # duplicate membership rows must not create self-pairs
    rows.append({"block_key": "X", "conv_id": "a"})
    ds = rd.from_items(rows)
    pairs = generate_pairs(ds, max_block_size=4, num_buckets=4).to_pandas()
    got = {tuple(r) for r in pairs[["conv_id_left", "conv_id_right"]].itertuples(index=False)}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


def test_attach_sides(rd):
    from ember_ray.stages.pairs import attach_sides

    pairs = rd.from_items([{"conv_id_left": "a", "conv_id_right": "b"}])
    convs = rd.from_items(
        [
            {"conv_id": "a", "text": "ta", "tokens": ["ta"]},
            {"conv_id": "b", "text": "tb", "tokens": ["tb"]},
        ]
    )
    out = attach_sides(pairs, convs, num_partitions=2).take_all()
    assert len(out) == 1
    assert out[0]["text_left"] == "ta" and out[0]["text_right"] == "tb"


def test_sharded_lookup_matches_single_index(rd):
    """The parallel sharded broadcast index must resolve exactly like one
    flat index (routing + order restore), including misses → nulls."""
    import ray

    from ember_ray.util import (broadcast_lookup, build_broadcast_index,
                                build_sharded_index_async, sharded_lookup)

    rows = [{"conv_id": f"c{i:03d}", "text": f"payload {i}"} for i in range(200)]
    ds = rd.from_items(rows).materialize()
    refs = build_sharded_index_async(ds, "conv_id", ["text"], num_shards=4)
    idxs = [ray.get(r) for r in refs]
    single = build_broadcast_index(
        pa.table({"conv_id": [r["conv_id"] for r in rows],
                  "text": [r["text"] for r in rows]}),
        "conv_id", ["text"])
    query = pa.array([f"c{i:03d}" for i in (5, 199, 42, 0, 500, 7, 7)])
    got = sharded_lookup(idxs, query, "text")
    want = broadcast_lookup(single, query, "text")
    assert got.to_pylist() == want.to_pylist()
    assert got.to_pylist()[4] is None  # miss → null


def test_scoring_identical_vs_disjoint(rd):
    from ember_ray.stages.scoring import PairScorer

    batch = pa.table(
        {
            "conv_id_left": ["a", "x"],
            "conv_id_right": ["b", "y"],
            "text_left": ["hello world foo", "completely different words"],
            "text_right": ["hello world foo", "zzz qqq ppp"],
            "tokens_left": pa.array([["hello", "world", "foo"], ["completely", "different", "words"]], pa.list_(pa.string())),
            "tokens_right": pa.array([["hello", "world", "foo"], ["zzz", "qqq", "ppp"]], pa.list_(pa.string())),
        }
    )
    out = PairScorer()(batch).to_pydict()
    assert out["score"][0] == pytest.approx(1.0, abs=1e-9)
    assert out["score"][1] < 0.5
    assert out["jaccard"] == [1.0, 0.0]


def test_connected_components_transitive_closure(rd):
    from ember_ray.stages.cluster import connected_components

    edges = rd.from_items(
        [
            {"src": "b", "dst": "a"},
            {"src": "b", "dst": "c"},
            {"src": "c", "dst": "d"},  # chain a-b-c-d
            {"src": "e", "dst": "f"},  # separate component
        ]
    )
    # both paths must agree: driver union-find fast path (threshold hit)
    # and the distributed min-label rounds (threshold 0)
    for thr in (2_000_000, 0):
        labels = connected_components(
            edges, num_buckets=4, num_partitions=4, driver_threshold=thr
        ).to_pandas()
        lab = dict(zip(labels["node"], labels["label"]))
        assert lab["a"] == lab["b"] == lab["c"] == lab["d"] == "a"
        assert lab["e"] == lab["f"] == "e"


def test_assign_entities_singletons(rd):
    from ember_ray.stages.cluster import assign_entities

    convs = rd.from_items([{"conv_id": c} for c in ["a", "b", "z"]])
    comps = rd.from_items([{"node": "a", "label": "a"}, {"node": "b", "label": "a"}])
    # both paths: broadcast lookup (threshold hit) and left-outer join
    for thr in (5_000_000, 0):
        ents = assign_entities(
            convs, comps, num_partitions=2, broadcast_threshold=thr
        ).to_pandas()
        e = dict(zip(ents["conv_id"], ents["entity_id"]))
        assert e == {"a": "a", "b": "a", "z": "z"}


def test_pairwise_eval_counts(rd):
    from ember_ray.stages.evaluate import pairwise_confusion, prf

    pairs = rd.from_items(
        [
            {"conv_id_left": "a", "conv_id_right": "b"},  # TP
            {"conv_id_left": "a", "conv_id_right": "c"},  # FP
            {"conv_id_left": "b", "conv_id_right": "d"},  # FN
            {"conv_id_left": "c", "conv_id_right": "d"},  # TN
        ]
    )
    entities = rd.from_items(
        [
            {"conv_id": "a", "entity_id": "e1"},
            {"conv_id": "b", "entity_id": "e1"},
            {"conv_id": "c", "entity_id": "e1"},
            {"conv_id": "d", "entity_id": "e2"},
        ]
    )
    gold = rd.from_items(
        [
            {"conv_id": "a", "cluster_id": 1},
            {"conv_id": "b", "cluster_id": 1},
            {"conv_id": "c", "cluster_id": 2},
            {"conv_id": "d", "cluster_id": 1},
        ]
    )
    # both attach paths must agree: broadcast (threshold hit) and
    # shuffle-join (threshold 0)
    for thr in (5_000_000, 0):
        conf = pairwise_confusion(
            pairs, entities, gold, num_partitions=2, broadcast_threshold=thr
        )
        assert (conf["tp"], conf["fp"], conf["fn"], conf["tn"]) == (1, 1, 1, 1)
        m = prf(conf)
        assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5


def test_blocking_report_counts(rd):
    """Planted gold {a,b,c}+{d,e}+singleton f → 4 gold pairs; candidates
    hit 3 of them plus one cross-cluster pair. Both attach paths
    (broadcast / bucketed) must agree on every field."""
    from ember_ray.stages.evaluate import blocking_report

    pairs = rd.from_items(
        [
            {"conv_id_left": "a", "conv_id_right": "b"},  # gold
            {"conv_id_left": "a", "conv_id_right": "c"},  # gold
            {"conv_id_left": "d", "conv_id_right": "e"},  # gold
            {"conv_id_left": "a", "conv_id_right": "f"},  # cross-cluster
        ]
    )
    gold = rd.from_items(
        [
            {"conv_id": "a", "cluster_id": 1},
            {"conv_id": "b", "cluster_id": 1},
            {"conv_id": "c", "cluster_id": 1},
            {"conv_id": "d", "cluster_id": 2},
            {"conv_id": "e", "cluster_id": 2},
            {"conv_id": "f", "cluster_id": 3},
        ]
    )
    for thr in (5_000_000, 0):
        rep = blocking_report(pairs, gold, num_partitions=2,
                              broadcast_threshold=thr)
        assert rep["n_records"] == 6
        assert rep["n_candidates"] == 4
        assert rep["n_gold_pairs"] == 4  # C(3,2) + C(2,2 choose) = 3 + 1
        assert rep["n_matched"] == 3
        assert rep["pairs_completeness"] == 0.75
        assert rep["reduction_ratio"] == 1.0 - 4 / 15


def test_blocking_sweep_planted(rd):
    """Identical token sets (a,b) share every band key at EVERY config
    (minhash is set-determined), disjoint c never collides (uint64 band
    keys): each grid row must read exactly 1 candidate = 1 gold match,
    completeness 1.0, reduction 1 - 1/3, with the right b / r labels."""
    from ember_ray.stages.evaluate import blocking_sweep

    toks = ["alpha", "beta", "gamma", "delta"]
    convs = rd.from_items(
        [
            {"conv_id": "a", "tokens": toks},
            {"conv_id": "b", "tokens": list(toks)},
            {"conv_id": "c", "tokens": ["zeta", "eta", "theta", "iota"]},
        ]
    )
    gold = rd.from_items(
        [
            {"conv_id": "a", "cluster_id": 1},
            {"conv_id": "b", "cluster_id": 1},
            {"conv_id": "c", "cluster_id": 2},
        ]
    )
    df, exports = blocking_sweep(convs, gold, band_grid=(8, 16, 32),
                                 num_buckets=4, num_partitions=2)
    assert df["num_bands"].tolist() == [8, 16, 32]
    assert df["rows_per_band"].tolist() == [8, 4, 2]
    assert df["n_candidates"].tolist() == [1, 1, 1]
    assert df["n_matched"].tolist() == [1, 1, 1]
    assert df["n_gold_pairs"].tolist() == [1, 1, 1]
    assert (df["pairs_completeness"] == 1.0).all()
    assert (df["reduction_ratio"] == 1.0 - (1 / 3)).all()
    got = exports[16].to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == [("a", "b")]


def test_threshold_stability_planted(rd):
    """Planted chain a–b(0.8)–c(0.72)–d(0.66) + never-edge e–f(0.5) over
    7 conversations (g isolated): entities 4/5/6 at τ=0.65/0.70/0.75,
    exactly one lo-merge ({abcd} = {abc}+{d}) and one mid-split
    ({abc} → {ab}+{c}); nested edge sets ⇒ counts are exact."""
    from ember_ray.stages.cluster import threshold_stability

    scored = rd.from_items(
        [
            {"conv_id_left": "a", "conv_id_right": "b", "score": 0.8},
            {"conv_id_left": "b", "conv_id_right": "c", "score": 0.72},
            {"conv_id_left": "c", "conv_id_right": "d", "score": 0.66},
            {"conv_id_left": "e", "conv_id_right": "f", "score": 0.5},
        ]
    )
    # both refinement attach paths (broadcast index / bucketed join)
    # must produce the identical card — the hybrid-rule parity pin
    for thr in (5_000_000, 0):
        got = threshold_stability(scored, 7, thresholds=(0.65, 0.7, 0.75),
                                  broadcast_threshold=thr).iloc[0]
        assert got["n_conversations"] == 7
        assert got["n_entities_lo"] == 4
        assert got["n_entities_mid"] == 5
        assert got["n_entities_hi"] == 6
        assert got["n_merge_lo_from_mid"] == 1
        assert got["n_split_mid_at_hi"] == 1


def test_clustering_agreement_planted(rd):
    """Gold {a,b,c}+{d,e}+{f} vs predicted {a,b}+{c,d,e}+{f}: by hand
    B³P = B³R = 14/18 ≈ 0.777778 and ARI = (2−16/15)/(4−16/15) = 7/22.
    Both attach paths must agree."""
    from ember_ray.stages.evaluate import clustering_agreement

    entities = rd.from_items(
        [
            {"conv_id": "a", "entity_id": "e1"},
            {"conv_id": "b", "entity_id": "e1"},
            {"conv_id": "c", "entity_id": "e2"},
            {"conv_id": "d", "entity_id": "e2"},
            {"conv_id": "e", "entity_id": "e2"},
            {"conv_id": "f", "entity_id": "e3"},
        ]
    )
    gold = rd.from_items(
        [
            {"conv_id": "a", "cluster_id": 1},
            {"conv_id": "b", "cluster_id": 1},
            {"conv_id": "c", "cluster_id": 1},
            {"conv_id": "d", "cluster_id": 2},
            {"conv_id": "e", "cluster_id": 2},
            {"conv_id": "f", "cluster_id": 3},
        ]
    )
    for thr in (5_000_000, 0):
        rep = clustering_agreement(entities, gold, num_partitions=2,
                                   broadcast_threshold=thr)
        assert rep["n_records"] == 6
        assert rep["sum_pairs_pred"] == 4   # C(2,2)+C(3,2)
        assert rep["sum_pairs_gold"] == 4   # C(3,2)+C(2,2)
        assert rep["sum_pairs_both"] == 2   # (e1,1)=2 and (e2,2)=2
        assert rep["bcubed_precision"] == 0.777778  # round-at-1e6
        assert rep["bcubed_recall"] == 0.777778
        # pinned expression of the two rounded values (not == p: the
        # 2pr/(p+r) float round-trip is off by one ulp)
        assert rep["bcubed_f1"] == 2 * 0.777778 * 0.777778 / (0.777778 + 0.777778)
        assert rep["ari"] == (2.0 - 16.0 / 15.0) / (4.0 - 16.0 / 15.0)


def test_golden_records_rules(rd):
    """Survivorship rules: canonical = min conv_id, rep = longest text
    with ties to the smaller conv_id, masses additive. Both attach
    paths must agree."""
    import pandas as pd

    from ember_ray.stages.survivorship import golden_records

    convs = rd.from_items(
        [
            {"conv_id": "a", "n_turns": 2, "text": "aaaa"},
            {"conv_id": "b", "n_turns": 1, "text": "bbbbbb"},
            {"conv_id": "c", "n_turns": 1, "text": "cc"},
            {"conv_id": "d", "n_turns": 3, "text": "ddd"},
            {"conv_id": "e", "n_turns": 1, "text": "eee"},
        ]
    )
    entities = rd.from_items(
        [
            {"conv_id": "a", "entity_id": "e1"},
            {"conv_id": "b", "entity_id": "e1"},
            {"conv_id": "c", "entity_id": "e2"},
            {"conv_id": "d", "entity_id": "e3"},
            {"conv_id": "e", "entity_id": "e3"},
        ]
    )
    for thr in (5_000_000, 0):
        got = (golden_records(convs, entities, num_partitions=2,
                              broadcast_threshold=thr)
               .to_pandas().sort_values("entity_id").reset_index(drop=True))
        want = pd.DataFrame(
            {
                "entity_id": ["e1", "e2", "e3"],
                "canonical_conv_id": ["a", "c", "d"],
                "n_conversations": [2, 1, 2],
                "n_turns": [3, 1, 4],
                "n_chars": [10, 2, 6],
                "rep_conv_id": ["b", "c", "d"],  # e3 tie at 3 → min id
                "rep_n_chars": [6, 2, 3],
            }
        )
        pd.testing.assert_frame_equal(
            got[want.columns].astype({c: "int64" for c in
                                      ("n_conversations", "n_turns",
                                       "n_chars", "rep_n_chars")}),
            want.astype({c: "int64" for c in
                         ("n_conversations", "n_turns",
                          "n_chars", "rep_n_chars")}))


def test_incremental_match_semantics(rd):
    """New records x0/y0 vs old catalog {a1,b1}+{c1}+{d1}: x0 ties at
    0.95 between b1 and d1 → smaller id b1 wins → entity a1 (b1's
    closure label); y0's only candidate is below threshold → founds its
    own entity; the new-new pair (x0,y0) must be ignored."""
    from ember_ray.pipelines.er_incremental import incremental_match

    scored = rd.from_items(
        [
            {"conv_id_left": "a1", "conv_id_right": "b1", "score": 0.9},
            {"conv_id_left": "x0", "conv_id_right": "b1", "score": 0.95},
            {"conv_id_left": "d1", "conv_id_right": "x0", "score": 0.95},
            {"conv_id_left": "y0", "conv_id_right": "c1", "score": 0.4},
            {"conv_id_left": "x0", "conv_id_right": "y0", "score": 0.99},
        ]
    )
    convs = rd.from_items(
        [{"conv_id": c} for c in ("a1", "b1", "c1", "d1", "x0", "y0")]
    )
    got = (incremental_match(scored, convs, threshold=0.5,
                             num_buckets=2, num_partitions=2)
           .to_pandas().set_index("conv_id").sort_index())
    assert list(got.index) == ["x0", "y0"]
    assert got.loc["x0", "matched_conv"] == "b1"
    assert got.loc["x0", "entity_id"] == "a1"
    assert got.loc["y0", "matched_conv"] == ""
    assert got.loc["y0", "entity_id"] == "y0"


def test_score_calibration_bins(rd):
    """2%-bin × gold-label counts: planted scores land in known bins,
    matches counted only where gold clusters agree; both attach paths."""
    from ember_ray.stages.evaluate import score_calibration

    pairs = rd.from_items(
        [
            {"conv_id_left": "a", "conv_id_right": "b", "score": 0.91},
            {"conv_id_left": "a", "conv_id_right": "c", "score": 0.30},
            {"conv_id_left": "b", "conv_id_right": "d", "score": 0.911},
            {"conv_id_left": "c", "conv_id_right": "d", "score": 0.62},
        ]
    )
    gold = rd.from_items(
        [
            {"conv_id": "a", "cluster_id": 1},
            {"conv_id": "b", "cluster_id": 1},
            {"conv_id": "c", "cluster_id": 2},
            {"conv_id": "d", "cluster_id": 1},
        ]
    )
    for thr in (5_000_000, 0):
        got = (score_calibration(pairs, gold, broadcast_threshold=thr,
                                 num_partitions=2)
               .to_pandas().set_index("bin").sort_index())
        assert got.loc[15].tolist() == [1, 0]   # 0.30 → bin 15, no match
        assert got.loc[31].tolist() == [1, 0]   # 0.62 → bin 31, no match
        assert got.loc[45].tolist() == [2, 2]   # 0.91/0.911 → bin 45
        assert len(got) == 3


def test_threshold_sweep_planted(rd):
    """Suffix sums over planted bins: with pairs in bins 15/31/45 (two
    matches in 45) and gold clusters {a,b,d},{c}, the curve must read
    n_pred/n_tp = (4,2) up to t=15, (3,2) up to t=31, (2,2) up to t=45,
    then (0,0); recall_gold uses C(3,2)=3 gold pairs (blocking missed
    b–d is NOT in the candidates and counts against it)."""
    from ember_ray.stages.evaluate import threshold_sweep

    pairs = rd.from_items(
        [
            {"conv_id_left": "a", "conv_id_right": "b", "score": 0.91},
            {"conv_id_left": "a", "conv_id_right": "c", "score": 0.30},
            {"conv_id_left": "b", "conv_id_right": "d", "score": 0.911},
            {"conv_id_left": "c", "conv_id_right": "d", "score": 0.62},
        ]
    )
    gold = rd.from_items(
        [
            {"conv_id": "a", "cluster_id": 1},
            {"conv_id": "b", "cluster_id": 1},
            {"conv_id": "c", "cluster_id": 2},
            {"conv_id": "d", "cluster_id": 1},
        ]
    )
    got = threshold_sweep(pairs, gold, num_partitions=2).set_index(
        "threshold_bin")
    assert len(got) == 50
    assert got.loc[0, ["n_pred", "n_tp"]].tolist() == [4, 2]
    assert got.loc[16, ["n_pred", "n_tp"]].tolist() == [3, 2]
    assert got.loc[32, ["n_pred", "n_tp"]].tolist() == [2, 2]
    assert got.loc[46, ["n_pred", "n_tp"]].tolist() == [0, 0]
    # single-division ratios: a–b 0.91 and b–d 0.911 are gold matches,
    # a–d is gold but was never a candidate → recall_gold = 2/3 at t=0
    assert got.loc[0, "precision_t"] == 2 / 4
    assert got.loc[0, "recall_cand"] == 1.0
    assert got.loc[0, "recall_gold"] == 2 / 3
    assert got.loc[46, "precision_t"] == 0.0


def test_agreement_patterns_planted(rd):
    """Bit packing in sorted feature order (a→bit0, b→bit1): planted
    feature vectors land in known pattern cells with exact counts."""
    from ember_ray.stages.evaluate import agreement_patterns

    pairs = rd.from_items(
        [
            {"a": 0.9, "b": 0.9},   # both agree   → pattern 3
            {"a": 0.9, "b": 0.1},   # a only       → pattern 1
            {"a": 0.1, "b": 0.9},   # b only       → pattern 2
            {"a": 0.1, "b": 0.1},   # neither      → pattern 0
            {"a": 0.5, "b": 0.9},   # a at cutoff (>=) counts → 3
        ]
    )
    got = (agreement_patterns(pairs, cutoffs={"a": 0.5, "b": 0.5})
           .to_pandas().set_index("pattern")["n_pairs"].sort_index())
    assert got.to_dict() == {0: 1, 1: 1, 2: 1, 3: 2}


def test_em_weights_recovers_planted_mixture():
    """EM over exact pattern counts from a known two-class mixture
    (λ=0.2, m=(0.95,0.9,0.8), u=(0.05,0.1,0.2), N=10^7 expected counts)
    recovers all seven parameters to <0.01 — the unsupervised
    Fellegi–Sunter core, pinned without gold labels. Three features are
    the identifiability floor (2^F cells must be ≥ 2F+1 free params;
    F=2 gives 4 cells vs 5 params and EM lands on a nearby ridge)."""
    import numpy as np

    from ember_ray.stages.evaluate import em_weights

    lam = 0.2
    m, u = np.array([0.95, 0.9, 0.8]), np.array([0.05, 0.1, 0.2])
    rows = []
    for pat in range(8):
        a = np.array([(pat >> i) & 1 for i in range(3)], np.float64)
        pm = np.prod(m ** a * (1 - m) ** (1 - a))
        pu = np.prod(u ** a * (1 - u) ** (1 - a))
        rows.append({"pattern": pat,
                     "n_pairs": int(round(1e7 * (lam * pm + (1 - lam) * pu)))})
    got = em_weights(rows, feats=["f0", "f1", "f2"]).set_index("feature")
    assert abs(got.loc["_lambda", "m_prob"] - lam) < 0.01
    for i, f in enumerate(("f0", "f1", "f2")):
        assert abs(got.loc[f, "m_prob"] - m[i]) < 0.01
        assert abs(got.loc[f, "u_prob"] - u[i]) < 0.01


def test_fs_scores_planted(rd):
    """Weight table from known m/u/λ, then per-pair log-odds: each of
    the four agreement patterns lands exactly on prior + its two fixed
    weights (left-associated, same order as the oracle expression)."""
    import numpy as np
    import pandas as pd

    from ember_ray.stages.evaluate import fs_scores, fs_weight_table

    em = pd.DataFrame({
        "feature": ["a", "b", "_lambda"],
        "m_prob": [0.8, 0.9, 0.25],
        "u_prob": [0.2, 0.1, 0.25],
    })
    w = fs_weight_table(em).set_index("feature")
    assert w.loc["a", "w_agree"] == np.log2(0.8 / 0.2)
    assert w.loc["a", "w_disagree"] == np.log2((1 - 0.8) / (1 - 0.2))
    assert w.loc["_prior", "w_agree"] == np.log2(0.25 / 0.75)

    pairs = rd.from_items(
        [
            {"conv_id_left": "p", "conv_id_right": "q", "a": 0.9, "b": 0.9},
            {"conv_id_left": "r", "conv_id_right": "s", "a": 0.9, "b": 0.1},
            {"conv_id_left": "t", "conv_id_right": "u", "a": 0.1, "b": 0.1},
        ]
    )
    got = (fs_scores(pairs, w.reset_index(), cutoffs={"a": 0.5, "b": 0.5})
           .to_pandas().set_index("conv_id_left")["log_odds"])
    pr = w.loc["_prior", "w_agree"]
    assert got["p"] == (pr + w.loc["a", "w_agree"]) + w.loc["b", "w_agree"]
    assert got["r"] == (pr + w.loc["a", "w_agree"]) + w.loc["b", "w_disagree"]
    assert got["t"] == (pr + w.loc["a", "w_disagree"]) + w.loc["b", "w_disagree"]


def test_entity_cohesion_planted(rd):
    """Planted chain a–b–c (edges a-b 0.9, b-c 0.85 ≥ τ=0.8; a-c 0.5
    forced in by transitivity) + an isolated below-threshold pair d-e:
    per-entity counts, forced-merge split and min/max scores are exact;
    both attach paths agree."""
    from ember_ray.stages.evaluate import entity_cohesion

    pairs = rd.from_items(
        [
            {"conv_id_left": "a", "conv_id_right": "b", "score": 0.9},
            {"conv_id_left": "b", "conv_id_right": "c", "score": 0.85},
            {"conv_id_left": "a", "conv_id_right": "c", "score": 0.5},
            {"conv_id_left": "d", "conv_id_right": "e", "score": 0.4},
        ]
    )
    entities = rd.from_items(
        [
            {"conv_id": "a", "entity_id": "a"},
            {"conv_id": "b", "entity_id": "a"},
            {"conv_id": "c", "entity_id": "a"},
            {"conv_id": "d", "entity_id": "d"},
            {"conv_id": "e", "entity_id": "e"},
        ]
    )
    for thr in (5_000_000, 0):
        got = (entity_cohesion(pairs, entities, threshold=0.8,
                               broadcast_threshold=thr, num_partitions=2)
               .to_pandas().set_index("entity_id").sort_index())
        # d-e crosses two entities → not intra-entity anywhere
        assert len(got) == 1
        row = got.loc["a"]
        assert row["n_pairs"] == 3
        assert row["n_direct"] == 2
        assert row["n_forced"] == 1
        assert row["min_score"] == 0.5
        assert row["max_score"] == 0.9


def test_match_weights_planted(rd):
    """Fellegi–Sunter m/u from planted features + gold: agreement counts
    conditioned on gold match/non-match are exact on both attach paths."""
    from ember_ray.stages.evaluate import match_weights

    pairs = rd.from_items(
        [
            {"conv_id_left": "a", "conv_id_right": "b",
             "jaccard": 0.6, "jaro_winkler": 0.95, "levenshtein": 0.9},
            {"conv_id_left": "a", "conv_id_right": "c",
             "jaccard": 0.4, "jaro_winkler": 0.95, "levenshtein": 0.7},
            {"conv_id_left": "b", "conv_id_right": "d",
             "jaccard": 0.55, "jaro_winkler": 0.5, "levenshtein": 0.85},
            {"conv_id_left": "c", "conv_id_right": "e",
             "jaccard": 0.1, "jaro_winkler": 0.2, "levenshtein": 0.1},
        ]
    )
    gold = rd.from_items(
        [
            {"conv_id": "a", "cluster_id": 1},
            {"conv_id": "b", "cluster_id": 1},
            {"conv_id": "c", "cluster_id": 2},
            {"conv_id": "d", "cluster_id": 1},
            {"conv_id": "e", "cluster_id": 3},
        ]
    )
    cutoffs = {"jaccard": 0.5, "jaro_winkler": 0.9, "levenshtein": 0.8}
    for thr in (5_000_000, 0):
        got = (match_weights(pairs, gold, cutoffs, broadcast_threshold=thr,
                             num_partitions=2)
               .to_pandas().set_index("feature").sort_index())
        assert len(got) == 3
        assert (got["n_match"] == 2).all() and (got["n_unmatch"] == 2).all()
        assert got.loc["jaccard"][["n_agree_match", "n_agree_unmatch"]
                                  ].tolist() == [2, 0]
        assert got.loc["jaro_winkler"][["n_agree_match", "n_agree_unmatch"]
                                       ].tolist() == [1, 1]
        assert got.loc["levenshtein"][["n_agree_match", "n_agree_unmatch"]
                                      ].tolist() == [2, 0]
        assert got.loc["jaccard", "m_prob"] == 1.0
        assert got.loc["jaccard", "u_prob"] == 0.0
        assert got.loc["jaro_winkler", "m_prob"] == 0.5
        assert got.loc["jaro_winkler", "u_prob"] == 0.5


def test_idf_build(rd):
    from ember_ray.stages.scoring import build_idf

    ds = rd.from_items(
        [
            {"tokens": ["a", "b"]},
            {"tokens": ["a", "c"]},
            {"tokens": ["a"]},
        ]
    )
    tid, vals = build_idf(ds, num_docs=3)
    # 3 distinct tokens → 3 entries; "a" (df=3) has smallest idf
    assert len(tid) == len(vals) == 3
    assert (np.diff(tid) > 0).all()  # sorted for searchsorted lookup
    assert vals.min() == pytest.approx(np.log(2.0))
    # hybrid combine: the shuffle path (threshold 0) must agree with the
    # driver-bincount path
    tid2, vals2 = build_idf(ds, num_docs=3, combine_threshold=0)
    assert (tid2 == tid).all()
    assert np.allclose(vals2, vals)
    # async task-parallel build (dense-accumulate combine) must agree too
    import ray

    from ember_ray.stages.scoring import build_idf_async

    tid3, vals3 = ray.get(build_idf_async(ds.materialize(), num_docs=3))
    assert (tid3 == tid).all()
    assert np.allclose(vals3, vals)


def test_generate_pairs_salted_oversize(rd):
    import pyarrow as pa

    from ember_ray.stages.pairs import generate_pairs

    # one hot block of 40 ids with max_block_size=10
    blocks = rd.from_arrow(
        pa.table(
            {
                "block_key": pa.array([1] * 40, pa.uint64()),
                "conv_id": pa.array([f"c{i:03d}" for i in range(40)]),
            }
        )
    )
    dropped = generate_pairs(blocks, max_block_size=10, num_buckets=4).to_pandas()
    assert len(dropped) == 0  # stop-key policy
    salted = generate_pairs(
        blocks, max_block_size=10, num_buckets=4, on_oversize="salt"
    ).to_pandas()
    # bounded: far fewer than the full 40*39/2=780, but signal kept
    assert 0 < len(salted) < 300
    assert (salted.conv_id_left < salted.conv_id_right).all()
    # deterministic across bucketing levels (content-derived salt)
    salted2 = generate_pairs(
        blocks, max_block_size=10, num_buckets=2, on_oversize="salt"
    ).to_pandas()
    a = salted.sort_values(["conv_id_left", "conv_id_right"]).reset_index(drop=True)
    b = salted2.sort_values(["conv_id_left", "conv_id_right"]).reset_index(drop=True)
    assert a.equals(b)


def test_hash_exchange_auto_buckets(rd):
    """num_buckets=None sizes buckets from input bytes: a tiny
    target_bucket_bytes budget must yield many buckets (none above the
    budget by more than skew), and results must equal the explicit path."""
    import pyarrow as pa

    from ember_ray.util import _auto_buckets, hash_exchange

    n = 20_000
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([f"k{i % 997}" for i in range(n)]),
                "v": pa.array(list(range(n)), pa.int64()),
            }
        )
    ).materialize()
    # ~20k rows of (short string + int64) ≈ a few hundred KB; a 4 KiB
    # budget must fan out well past the cpu floor
    nb = _auto_buckets(ds, target_bucket_bytes=4096)
    assert nb > 8

    def agg(df):
        g = df.groupby("k", sort=False)["v"].sum()
        return pd.DataFrame({"k": g.index.to_numpy(), "s": g.to_numpy()})

    auto = hash_exchange(ds, "k", None, agg, target_bucket_bytes=4096)
    assert auto.materialize().num_blocks() == nb
    explicit = hash_exchange(ds, "k", 16, agg)
    a = auto.to_pandas().sort_values("k").reset_index(drop=True)
    b = explicit.to_pandas().sort_values("k").reset_index(drop=True)
    assert a.equals(b)


def test_hashed_pair_path_matches_string_path(rd):
    """The uint64 pair path (make_blocks(hashed=True) → hl/hr exchanges →
    hash_sharded_lookup string resolution) must produce exactly the string
    path's pair set, in lexicographic output orientation."""
    import numpy as np
    import ray

    from ember_ray.stages.blocking import make_blocks
    from ember_ray.stages.pairs import attach_sides, generate_pairs
    from ember_ray.stages.tokenize import add_tokens
    from ember_ray.util import stable_hash64

    rows = []
    for g in range(12):
        base = [f"tok{g}_{i}" for i in range(40)]
        for m in range(3):
            toks = base[: 40 - m] + [f"extra{g}_{m}_{i}" for i in range(m)]
            rows.append({"conv_id": f"g{g:02d}_m{m}", "text": " ".join(toks)})
    convs = add_tokens(rd.from_items(rows)).materialize()

    sp = generate_pairs(
        make_blocks(convs, num_perm=32, num_bands=8), max_block_size=8,
        num_buckets=4,
    ).to_pandas()
    want = {tuple(r) for r in sp[["conv_id_left", "conv_id_right"]]
            .itertuples(index=False)}

    hp = generate_pairs(
        make_blocks(convs, num_perm=32, num_bands=8, hashed=True),
        max_block_size=8, num_buckets=4,
    )
    hdf = hp.to_pandas()
    assert set(hdf.columns) == {"hl", "hr"}
    assert (hdf["hl"].to_numpy() < hdf["hr"].to_numpy()).all()
    # hash set equals the string pair set under stable_hash64
    h = dict(zip(stable_hash64([r["conv_id"] for r in rows]),
                 [r["conv_id"] for r in rows]))
    got = set()
    for a, b in hdf[["hl", "hr"]].itertuples(index=False):
        got.add(tuple(sorted((h[np.uint64(a)], h[np.uint64(b)]))))
    assert got == want

    # attach resolves strings + payloads and restores lexicographic order
    att = attach_sides(hp, convs, columns=("text",)).to_pandas()
    assert (att["conv_id_left"] < att["conv_id_right"]).all()
    got2 = {tuple(r) for r in att[["conv_id_left", "conv_id_right"]]
            .itertuples(index=False)}
    assert got2 == want
    texts = {r["conv_id"]: r["text"] for r in rows}
    assert all(att["text_left"].iloc[i] in
               (texts[att["conv_id_left"].iloc[i]],
                texts[att["conv_id_right"].iloc[i]])
               for i in range(len(att)))


def test_prehashed_scorer_matches_string_path(rd):
    """PairScorer over thash/ttf lists must produce bitwise-identical
    features to the tokenize-in-scorer path (same 43-bit packed space,
    same tf weights, same IDF ids)."""
    import numpy as np
    import pyarrow as pa

    from ember_ray.functions.minhash import token_hash_lists
    from ember_ray.functions.text import tokenize_array
    from ember_ray.stages.scoring import PairScorer

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 40)))
             for _ in range(257)]
    tl = pa.array(texts)
    tr = pa.array(texts[1:] + texts[:1])
    ids = pa.array([f"c{i}" for i in range(257)])
    base = {"conv_id_left": ids, "conv_id_right": ids,
            "text_left": tl, "text_right": tr}
    thl, ttl = token_hash_lists(tokenize_array(tl))
    thr, ttr = token_hash_lists(tokenize_array(tr))
    hashed = dict(base, thash_left=thl, ttf_left=ttl,
                  thash_right=thr, ttf_right=ttr)
    # a fake idf so the cosine actually exercises the weight lookup
    sc = PairScorer()
    tid = np.arange(0, 1 << 20, 97, dtype=np.int64)
    sc.idf = (tid, 1.0 + (tid % 7) / 3.0)
    a = sc(pa.table(base))
    b = sc(pa.table(hashed))
    for colname in ("jaccard", "tfidf_cosine", "jaro_winkler",
                    "levenshtein", "score"):
        av = np.asarray(a[colname].combine_chunks())
        bv = np.asarray(b[colname].combine_chunks())
        assert (av == bv).all(), colname


def test_hashed_pair_salt_matches_string_path(rd):
    """Salted oversize blocks: the hashed path's cid % k salt must select
    the same sub-block members as the string path's bucket_of(conv_id, k)
    (cid IS stable_hash64(conv_id)), so the pair sets agree."""
    import numpy as np

    from ember_ray.stages.pairs import generate_pairs
    from ember_ray.util import stable_hash64

    ids = [f"conv{i:03d}" for i in range(23)]
    rows = [{"block_key": "HOT", "conv_id": c} for c in ids]
    ds = rd.from_items(rows)
    sp = generate_pairs(ds, max_block_size=4, num_buckets=2,
                        on_oversize="salt").to_pandas()
    want = {tuple(r) for r in sp[["conv_id_left", "conv_id_right"]]
            .itertuples(index=False)}

    h = stable_hash64(ids)
    hrows = [{"block_key": np.uint64(7), "cid": v} for v in h]
    hp = generate_pairs(rd.from_items(hrows), max_block_size=4,
                        num_buckets=2, on_oversize="salt").to_pandas()
    m = dict(zip(h, ids))
    got = {tuple(sorted((m[np.uint64(a)], m[np.uint64(b)])))
           for a, b in hp[["hl", "hr"]].itertuples(index=False)}
    assert got == want and len(got) > 0


def test_cc_from_scored_both_paths(rd):
    """connected_components_from_scored: the fused driver path and the
    distributed fallback (driver_threshold=0) must agree with the
    edge-dataset API on thresholded scored input."""
    scored = rd.from_items(
        [
            {"conv_id_left": "a", "conv_id_right": "b", "score": 0.9},
            {"conv_id_left": "b", "conv_id_right": "c", "score": 0.95},
            {"conv_id_left": "c", "conv_id_right": "d", "score": 0.2},  # cut
            {"conv_id_left": "e", "conv_id_right": "f", "score": 0.8},
        ]
    )
    from ember_ray.stages.cluster import connected_components_from_scored

    for thr in (2_000_000, 0):
        labels = connected_components_from_scored(
            scored, 0.7, num_buckets=4, num_partitions=4,
            driver_threshold=thr,
        ).to_pandas()
        lab = dict(zip(labels["node"], labels["label"]))
        assert lab["a"] == lab["b"] == lab["c"] == "a"
        assert "d" not in lab
        assert lab["e"] == lab["f"] == "e"


def test_hash_exchange_bumps_undersized_bucket_config(rd):
    """An explicit num_buckets too small for the input bytes is bumped by
    the memory rule (reduce tasks concat whole buckets), with identical
    results."""
    import pyarrow as pa

    from ember_ray.util import hash_exchange

    n = 20_000
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([f"k{i % 997}" for i in range(n)]),
                "v": pa.array(list(range(n)), pa.int64()),
            }
        )
    ).materialize()

    def agg(df):
        g = df.groupby("k", sort=False)["v"]
        import pandas as pd

        return pd.DataFrame({"k": g.min().index, "v_min": g.min().to_numpy()})

    bumped = hash_exchange(ds, "k", 2, agg, target_bucket_bytes=4096)
    assert bumped.materialize().num_blocks() > 2  # memory rule won
    plain = hash_exchange(ds, "k", 2, agg)
    a = bumped.to_pandas().sort_values("k").reset_index(drop=True)
    b = plain.to_pandas().sort_values("k").reset_index(drop=True)
    assert a.equals(b)
