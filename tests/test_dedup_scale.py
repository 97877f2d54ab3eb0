"""Scale-safety tests for the dedup suite (VERDICT r3 #2/#4): oversize-
block observability, salt-split candidate retention, and corpus-scaled
embedding LSH with non-degenerate recall at 10x the gate corpus."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _blocks_ds(rd, rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_oversize_drop_is_counted(rd):
    """A planted hot key above the cap must fire the drop-stats counter —
    never a silent candidate loss (VERDICT r3 #4)."""
    from ember_ray.pipelines.dedup import _pairs_from_blocks
    from ember_ray.state.stats import drop_counts, reset_drop_counts

    reset_drop_counts()
    rows = pd.DataFrame({
        "block_key": np.array([1] * 10 + [2, 2], np.uint64),
        "doc_id": np.arange(12, dtype=np.int64),
    })
    out = _pairs_from_blocks(
        _blocks_ds(rd, rows), "doc_id", num_buckets=4, cap=4,
        on_oversize="drop", stage="test_drop").to_pandas()
    # hot block (10 members) dropped; the small block's single pair kept
    assert len(out) == 1
    c = drop_counts()["test_drop"]
    assert c["blocks"] == 1 and c["rows"] == 10 and c["policy"] == "drop"


def test_oversize_salt_keeps_candidates_and_counts(rd):
    """salt policy: the hot block splits into ceil(n/cap) sub-blocks —
    pairs survive (bounded at O(n*cap)), and the event is still counted."""
    from ember_ray.pipelines.dedup import _pairs_from_blocks
    from ember_ray.state.stats import drop_counts, reset_drop_counts

    reset_drop_counts()
    rows = pd.DataFrame({
        "block_key": np.array([7] * 10, np.uint64),
        "doc_id": np.arange(10, dtype=np.int64),
    })
    out = _pairs_from_blocks(
        _blocks_ds(rd, rows), "doc_id", num_buckets=4, cap=4,
        on_oversize="salt", stage="test_salt").to_pandas()
    # ids 0..9, k=ceil(10/4)=3 salt groups by id%3 -> sizes 4,3,3 ->
    # 6+3+3=12 pairs; full cross would be 45
    assert len(out) == 12
    got = {tuple(r) for r in out.itertuples(index=False)}
    for left, right in got:
        assert left < right and left % 3 == right % 3
    c = drop_counts()["test_salt"]
    assert c["blocks"] == 1 and c["rows"] == 10 and c["policy"] == "salt"


def test_er_pairs_drop_counter_fires(rd):
    """The ER pair generator reports oversize blocks to the same side
    channel (planted hot key above max_block_size)."""
    from ember_ray.stages.pairs import generate_pairs
    from ember_ray.state.stats import drop_counts, reset_drop_counts

    reset_drop_counts()
    rows = [{"block_key": "hot", "conv_id": f"c{i}"} for i in range(9)]
    rows += [{"block_key": "ok", "conv_id": c} for c in ("a", "b")]
    pairs = generate_pairs(rd.from_items(rows), max_block_size=4,
                           num_buckets=2).to_pandas()
    assert {tuple(r) for r in pairs.itertuples(index=False)} == {("a", "b")}
    c = drop_counts()["er_pairs"]
    assert c["blocks"] == 1 and c["rows"] == 9


def test_embedding_plane_count_scales_with_corpus():
    """Fixed 8-plane LSH saturates at scale (256 buckets ever); the plane
    count must grow ~log2(n) so expected bucket population stays bounded."""
    from ember_ray.pipelines.dedup import _embedding_planes

    n8 = _embedding_planes(500, 1, 64).shape[1]
    n_mid = _embedding_planes(1_000_000, 1, 64).shape[1]
    n_big = _embedding_planes(1_000_000_000, 1, 64).shape[1]
    assert n8 == 8            # gate scale: unchanged behavior
    assert n_mid == 14        # 1M rows / 64 target pop = 2^14 buckets
    assert n_big == 24        # clamped: key stays in the uint64 budget
    assert n8 < n_mid <= n_big


def _write_embeddings(path: str, vecs: np.ndarray):
    os.makedirs(path, exist_ok=True)
    n, d = vecs.shape
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel().astype(np.float32)), d
        ).cast(pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))


def test_dedup_embedding_recall_at_10x_gate(rd, tmp_path):
    """At 10x the gate corpus (5000 vectors), planted near-dup pairs
    (cosine ~0.95) must be recovered at non-degenerate recall — the
    multi-table corpus-scaled LSH must not collapse as buckets fill
    (VERDICT r3 #2 'done' criterion)."""
    rng = np.random.default_rng(7)
    n_base, dim = 2300, 64
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # plant a near-dup twin for every even base vector: ids (2i, 2i+1);
    # noise 0.05 -> cosine ~0.93, the operating regime for near-dup
    # detection (expected 4-table sign-LSH union recall ~0.83)
    vecs = np.empty((2 * n_base, dim))
    vecs[0::2] = base
    noise = rng.standard_normal((n_base, dim)) * 0.05
    twin = base + noise
    twin /= np.linalg.norm(twin, axis=1, keepdims=True)
    vecs[1::2] = twin
    # plus background singletons to 5000 rows
    extra = rng.standard_normal((5000 - 2 * n_base, dim))
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    vecs = np.vstack([vecs, extra])

    sf_dir = str(tmp_path / "sf10x")
    _write_embeddings(sf_dir, vecs)

    from ember_ray.pipelines.dedup import dedup_embedding

    cos = (vecs[0:2 * n_base:2] * vecs[1:2 * n_base:2]).sum(1)
    planted = {(2 * i, 2 * i + 1) for i in range(n_base) if cos[i] >= 0.5}
    out = dedup_embedding(sf_dir, threshold=0.5).to_pandas()
    got = {tuple(sorted(p)) for p in
           out[["vec_id_left", "vec_id_right"]].itertuples(index=False)}
    recall = len(planted & got) / max(len(planted), 1)
    assert recall >= 0.6, f"degenerate candidate recall {recall:.3f}"


def test_cc_mid_closure_resume(rd, tmp_path):
    """A run killed between min-label rounds resumes from the last
    checkpointed round and reproduces byte-identical components
    (VERDICT r3 #6 / SURVEY 7.3 mid-closure checkpoint)."""
    import pytest

    from ember_ray.stages.cluster import connected_components
    from ember_ray.state.checkpoint import Checkpointer

    # chain of 10 nodes: min-label propagation needs ~9 rounds, so an
    # injected kill after round 1 lands genuinely mid-closure
    nodes = [f"n{i:02d}" for i in range(10)]
    edges = rd.from_items(
        [{"src": a, "dst": b} for a, b in zip(nodes, nodes[1:])]
    )
    kw = dict(num_buckets=4, num_partitions=4, driver_threshold=0)

    fresh = connected_components(edges, **kw).to_pandas()
    root = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="injected failure"):
        connected_components(edges, checkpointer=Checkpointer(root),
                             ckpt_fp="t1", _fail_after_round=1, **kw)
    ck2 = Checkpointer(root)
    resumed = connected_components(edges, checkpointer=ck2, ckpt_fp="t1",
                                   **kw).to_pandas()
    assert ck2.hits.get("cc_rounds", 0) >= 2  # rounds 0-1 were skipped
    f = fresh.sort_values("node").reset_index(drop=True)
    r = resumed.sort_values("node").reset_index(drop=True)
    assert r.equals(f)
    assert set(r["label"]) == {"n00"}

    # a third run resumes AT convergence: labels come straight back
    ck3 = Checkpointer(root)
    again = connected_components(edges, checkpointer=ck3, ckpt_fp="t1",
                                 **kw).to_pandas()
    assert again.sort_values("node").reset_index(drop=True).equals(f)


def _write_docs(tmp_path, texts):
    d = tmp_path / "documents.parquet"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(d / "part-0.parquet"))
    return str(tmp_path)


def test_dedup_substring_planted_overlap(ray_session, tmp_path):
    """Two docs sharing one exact 32-char run must pair with the right
    distinct-window count; unrelated docs must not pair."""
    from ember_ray.pipelines.dedup import dedup_substring

    shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"  # 36 chars
    rng = np.random.default_rng(3)

    def noise(n):
        return "".join(chr(c) for c in rng.integers(97, 123, size=n))

    texts = [
        noise(40) + shared + noise(40),          # doc 0
        noise(52) + shared + noise(29),          # doc 1: same 36-char run
        noise(120),                               # doc 2: unrelated
        noise(90),                                # doc 3: unrelated
    ]
    out = dedup_substring(_write_docs(tmp_path, texts), L=32).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    # a shared 36-char run contains 36-32+1 = 5 distinct 32-char windows
    assert (row["doc_id_left"], row["doc_id_right"]) == (0, 1)
    assert row["n_shared"] == 5


def test_dedup_substring_hot_window_counted(ray_session, tmp_path):
    """A boilerplate window shared by more docs than the cap is dropped
    AND counted to the stats side channel — never silent."""
    from ember_ray.pipelines.dedup import dedup_substring
    from ember_ray.state.stats import drop_counts, reset_drop_counts

    reset_drop_counts()
    boiler = "x" * 32  # one identical window in every doc
    rng = np.random.default_rng(5)

    def noise(n):
        return "".join(chr(c) for c in rng.integers(97, 123, size=n))

    texts = [noise(33 + i) + boiler for i in range(6)]
    out = dedup_substring(_write_docs(tmp_path, texts), L=32,
                          cap=4).to_pandas()
    assert len(out) == 0
    c = drop_counts()["dedup_substring"]
    assert c["blocks"] >= 1 and c["policy"] == "drop"


def test_dedup_substring_partition_invariance(ray_session):
    """Output must not depend on input block layout or bucket count."""
    import ember_ray.pipelines.dedup as dmod
    from ember_ray.pipelines.dedup import dedup_substring

    key = ["doc_id_left", "doc_id_right"]
    a = (dedup_substring("/root/testdata/sf0.001").to_pandas()
         .sort_values(key).reset_index(drop=True))
    assert len(a) > 0
    orig = dmod._docs

    def shredded(sf_dir):
        return orig(sf_dir).repartition(11)

    dmod._docs = shredded
    try:
        b = (dedup_substring("/root/testdata/sf0.001", num_buckets=5)
             .to_pandas().sort_values(key).reset_index(drop=True))
    finally:
        dmod._docs = orig
    assert a.equals(b)


def test_dedup_containment_planted(ray_session, tmp_path):
    """A doc that is a verbatim substring of another must flag as
    contained (side points at it); partial-overlap pairs must not."""
    from ember_ray.pipelines.dedup import dedup_containment

    rng = np.random.default_rng(11)

    def noise(n):
        return "".join(chr(c) for c in rng.integers(97, 123, size=n))

    inner = noise(60)
    partial = noise(40)
    texts = [
        noise(30) + inner + noise(25),   # doc 0: container
        inner,                            # doc 1: fully inside doc 0
        noise(45) + partial + noise(45),  # doc 2: shares a 40-char run w/ 3
        partial + noise(70),              # doc 3: partial overlap only
    ]
    out = dedup_containment(
        _write_docs(tmp_path, texts), L=32).to_pandas()
    rows = {(r.doc_id_left, r.doc_id_right): r.contained_side
            for r in out.itertuples()}
    assert rows[(0, 1)] == 2           # right (doc 1) inside left (doc 0)
    assert (2, 3) not in rows          # overlap but neither contains


def test_dedup_incremental_planted(ray_session, tmp_path):
    """A new doc that near-duplicates an old doc is flagged with the
    smallest old partner; a clean new doc passes with dup_of = -1."""
    from ember_ray.pipelines.dedup import dedup_incremental

    rng = np.random.default_rng(17)

    def words(n):
        return " ".join("w%d" % c for c in rng.integers(0, 5000, size=n))

    shared = words(60)
    texts = {
        0: shared + " tail0",          # new (0 % 10): near-dup of 3 and 13
        10: words(70),                 # new: clean
        3: shared + " tail3",          # old
        13: shared + " tail13",        # old
        7: words(70),                  # old, unrelated
    }
    d = tmp_path / "documents.parquet"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()), pa.string())}),
        str(d / "part-0.parquet"))
    out = (dedup_incremental(str(tmp_path), threshold=0.7)
           .to_pandas().set_index("doc_id"))
    assert set(out.index) == {0, 10}
    assert out.loc[0, "is_dup"] == 1 and out.loc[0, "dup_of"] == 3
    assert out.loc[10, "is_dup"] == 0 and out.loc[10, "dup_of"] == -1
