"""Sources/sinks: multi-char-delimited CSV (S1), JSONL.gz (S4), plain CSV
(S5/K2), hive-partitioned parquet sink (K1)."""

import gzip
import json
import os

import pyarrow as pa
import pytest


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def test_multichar_delimited_reader(ray_session, workdir):
    from ember_ray.sources import read_multichar_delimited

    p = os.path.join(workdir, "raw.txt")
    with open(p, "w") as f:
        f.write("1@;@iphone 12 pro@;@cat a\n")
        f.write("@;@title with @ sign@;@cat b\n")   # empty id → null
        f.write("3@;@short\n")                      # ragged → "" fill
        f.write("4@;@x@;@y@;@overflow kept\n")      # overflow → last field
    ds = read_multichar_delimited(p, sep="@;@", names=["id", "title", "cate"],
                                  types={"id": pa.int64()})
    rows = {str(r["id"]): r for r in ds.take_all()}
    assert rows["1"] == {"id": 1, "title": "iphone 12 pro", "cate": "cat a"}
    assert rows["None"]["id"] is None and rows["None"]["title"] == "title with @ sign"
    assert rows["3"]["cate"] == ""
    assert rows["4"]["cate"] == "y@;@overflow kept"


def test_jsonl_gz_reader_and_sinks(ray_session, workdir):
    import ray.data as rd

    from ember_ray.sources import read_jsonl, write_csv, write_partitioned_parquet

    p = os.path.join(workdir, "x.jsonl.gz")
    with gzip.open(p, "wt") as f:
        for i in range(6):
            f.write(json.dumps({"a": i, "b": f"t{i}", "nested": {"k": i}}) + "\n")
    ds = read_jsonl(p, drop_columns=["nested"])  # WDC-style struct strip
    assert sorted(ds.schema().names) == ["a", "b"]
    assert ds.count() == 6

    write_csv(ds, os.path.join(workdir, "csv_out"))
    assert any(os.scandir(os.path.join(workdir, "csv_out")))

    out = os.path.join(workdir, "pq_out")
    write_partitioned_parquet(ds, out, partition_key="b", num_partitions=4)
    parts = [e.name for e in os.scandir(out) if e.name.startswith("part=")]
    assert parts  # content-derived hive layout
    back = rd.read_parquet(out)
    assert back.count() == 6


def test_plain_csv_roundtrip(ray_session, workdir):
    """S5: single-char CSV via ray.data.read_csv (no custom code needed)."""
    import ray.data as rd

    p = os.path.join(workdir, "plain.csv")
    with open(p, "w") as f:
        f.write("pair_id,score\n1,0.5\n2,0.9\n")
    ds = rd.read_csv(p)
    assert ds.count() == 2 and sorted(ds.schema().names) == ["pair_id", "score"]


def test_synth_per_slice_shuffle_matches_global(tmp_path):
    """ensure_corpus writes each file as a permutation-slice take (the
    global whole-table take overflowed 32-bit string offsets past ~3.5M
    conversations); the written corpus must stay byte-identical to the
    old global-shuffle-then-slice layout."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.synth import SynthConfig, ensure_corpus, generate

    cfg = SynthConfig(n_clusters=120, max_cluster_size=5,
                      distractors_per_cluster=1, n_singletons=60, seed=977)
    out = ensure_corpus(cfg, root=str(tmp_path))
    t, _ = generate(cfg)
    perm = np.random.default_rng(cfg.seed + 1).permutation(len(t))
    ref = t.take(pa.array(perm)).combine_chunks()
    files = sorted(glob.glob(out + "/transcripts.parquet/part-*.parquet"))
    got = pa.concat_tables(pq.read_table(f) for f in files).combine_chunks()
    assert got.equals(ref)
