"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ember_ray) calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` maps SURVEY.md §2 operators (plus the training-data-pipeline
extensions: dedup suite, ANN search, text analysis, multimodal plumbing,
and the flagship ER pipeline) to callables over ``sf_dir``;
``oracle_sql()`` provides the DuckDB equivalent for every
SQL-expressible entry with IDENTICAL column names. Float aggregates are
rounded on both sides (see relational._round_cols) so value-hash
comparison is exact.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _er_corpus(sf_dir: str) -> str:
    """Deterministic synthetic transcript corpus scaled to the sf level
    (the transcripts shape is the engine's primary input; the driver's
    TPC-H-ish tables don't carry one, so it is synthesised per
    BASELINE.json input_hint — seeded, no external data)."""
    from ember_ray.synth import SynthConfig, ensure_corpus

    sf = 0.001
    try:
        import re

        m = re.search(r"sf([0-9.]+)", sf_dir)
        if m:
            sf = float(m.group(1))
    except Exception:
        pass
    n_clusters = max(20, int(2000 * sf))
    cfg = SynthConfig(
        n_clusters=n_clusters,
        max_cluster_size=5,
        distractors_per_cluster=2,
        n_singletons=max(10, n_clusters // 2),
        seed=142,
    )
    return ensure_corpus(cfg)


def _er_cfg():
    from ember_ray.pipelines.er import ERConfig

    return ERConfig(scorer_concurrency=2, num_buckets=16, num_partitions=8,
                    score_parts=8)


def entry() -> Any:
    """Flagship ER pipeline on the sf0.001-scale synthetic transcript
    corpus: assemble → block → pair → score → cluster; returns the
    (conv_id, entity_id) assignment Dataset."""
    from ember_ray.pipelines.er import run_er

    corpus = _er_corpus("/root/testdata/sf0.001")
    out = run_er(corpus, _er_cfg())
    return out["entities"]


_ER_CACHE: dict[str, dict] = {}


def _er_run(sf_dir: str) -> dict:
    corpus = _er_corpus(sf_dir)
    if corpus not in _ER_CACHE:
        from ember_ray.pipelines.er import run_er

        _ER_CACHE[corpus] = run_er(corpus, _er_cfg())
    return _ER_CACHE[corpus]


_SIDE_DIR = "/tmp/ember_ray_oracle_side"  # inputs the static oracle SQL reads

_ER_EXPORTED: set[str] = set()


def _export_er_graph(sf_dir: str) -> dict:
    """Export the flagship run's verifiable intermediates for the DuckDB
    oracles (the dedup_minhash_verify pattern, VERDICT r2 #4): candidate
    pair ids + thresholded edges as parquet under ``_SIDE_DIR``, plus
    side-links to the corpus transcripts/gold. From these the oracle SQL
    independently re-derives assembly, the min-label transitive closure
    (``WITH RECURSIVE``), entity assignment, cluster sizes, and the
    pairwise confusion — everything downstream of scoring."""
    import os
    import shutil

    out = _er_run(sf_dir)
    corpus = _er_corpus(sf_dir)
    if corpus in _ER_EXPORTED:
        return out
    from ember_ray.stages.scoring import edges_from_scores

    _side_link("transcripts", os.path.join(corpus, "transcripts.parquet"))
    _side_link("gold_clusters", os.path.join(corpus, "gold_clusters.parquet"))
    for name, ds in (
        ("er_pairs", out["scored"].select_columns(
            ["conv_id_left", "conv_id_right", "score"])),
        ("er_edges", edges_from_scores(out["scored"],
                                       threshold=_er_cfg().threshold)),
    ):
        path = os.path.join(_SIDE_DIR, name)
        shutil.rmtree(path, ignore_errors=True)
        ds.write_parquet(path)
    _ER_EXPORTED.add(corpus)
    return out


# the min-label transitive closure, re-derived in pure SQL from the
# exported thresholded edges (U3 oracle): seed every conversation with its
# own id; a label m spreads along symmetrized edges to any larger node —
# (n, m) reachable ⇔ path m→n through nodes > m, so min(label) per node is
# exactly the component min the engine's connected_components computes.
_CC_SQL = (
    "conv AS (SELECT DISTINCT conv_id FROM "
    f"read_parquet('{_SIDE_DIR}/transcripts/*.parquet')), "
    f"e AS (SELECT src, dst FROM read_parquet('{_SIDE_DIR}/er_edges/*.parquet')), "
    "sym AS (SELECT src AS a, dst AS b FROM e UNION "
    "SELECT dst AS a, src AS b FROM e), "
    "walk(node, label) AS ("
    "SELECT conv_id, conv_id FROM conv "
    "UNION "
    "SELECT s.b, w.label FROM walk w JOIN sym s ON s.a = w.node "
    "WHERE w.label < s.b), "
    "ent AS (SELECT node AS conv_id, min(label) AS entity_id "
    "FROM walk GROUP BY node)"
)


def _q_er_entities(sf_dir: str):
    return _export_er_graph(sf_dir)["entities"]


def _q_er_scored(sf_dir: str):
    return _er_run(sf_dir)["scored"]


def _q_er_similarity_verify(sf_dir: str):
    """The scored pairs' SQL-expressible features (token Jaccard,
    Jaro-Winkler, Levenshtein-ratio), with the pair ids exported so
    DuckDB recomputes all three independently from the raw transcripts
    (re-assembling the conversation text itself). The engine computes
    JW/Lev with DuckDB's own kernels (similarity.py:126-131) so parity
    there is bitwise; Jaccard rides the hashed-token kernel whose 43-bit
    packing collides at ~k²/2^44 per pair — zero expected mismatches
    below ~10^9 candidate pairs (ADVICE r2 budget note). tfidf_cosine /
    score stay rows-only: the hashing-trick IDF space is not
    SQL-expressible."""
    out = _export_er_graph(sf_dir)
    # NO rounding on either side: all three features are float64 quotients
    # of the same small integers computed with the same IEEE ops (JW/Lev
    # literally by DuckDB in both engines), so raw values are bitwise
    # identical — while round-at-1e6 broke parity (lev is a multiple of
    # 1/128, ×1e6 lands exactly on .5 where np.rint half-even and DuckDB
    # round half-away disagree).
    return out["scored"].select_columns(
        ["conv_id_left", "conv_id_right", "jaccard", "jaro_winkler",
         "levenshtein"]
    )


def _q_er_metrics(sf_dir: str):
    import pandas as pd

    return pd.DataFrame([_export_er_graph(sf_dir)["metrics"]])


def _q_er_cluster_sizes(sf_dir: str):
    """Predicted-entity size histogram (count-of-counts): the audit the
    reference runs driver-side over its datasets (stat_ali.py label
    counts); here a two-level distributed aggregate."""
    from ray.data.aggregate import Count

    ents = _export_er_graph(sf_dir)["entities"]
    sizes = ents.groupby("entity_id").aggregate(Count(alias_name="size"))
    return sizes.groupby("size").aggregate(Count(alias_name="n_entities"))


def _q_er_blocking_report(sf_dir: str):
    """Blocking-quality audit over the flagship run's candidate set:
    pairs completeness (gold-pair recall of blocking) + reduction ratio
    vs the all-pairs search space. Oracle re-derives both from the
    exported candidate ids and the gold table; float fields are raw
    quotients of exact int64s (bitwise parity, no rounding)."""
    import os

    import pandas as pd
    import ray.data as rd

    from ember_ray.stages.evaluate import blocking_report

    out = _export_er_graph(sf_dir)  # exports er_pairs + links gold
    gold = rd.read_parquet(
        os.path.join(_er_corpus(sf_dir), "gold_clusters.parquet"),
        columns=["conv_id", "cluster_id"])
    return pd.DataFrame([blocking_report(out["scored"], gold)])


def _q_er_clustering_report(sf_dir: str):
    """B³ precision/recall/F1 + Adjusted Rand Index of the predicted
    partition vs gold — the full-partition agreement metrics the
    candidate-conditioned er_metrics can't see. Oracle re-derives the
    partition itself (recursive-CTE closure) and both metrics from the
    same contingency-table SQL; ARI is bitwise (exact int64 inputs,
    pinned expression), B³ carries the house round-at-1e6."""
    import os

    import pandas as pd
    import ray.data as rd

    from ember_ray.stages.evaluate import clustering_agreement

    out = _export_er_graph(sf_dir)  # exports er_edges + links gold
    gold = rd.read_parquet(
        os.path.join(_er_corpus(sf_dir), "gold_clusters.parquet"),
        columns=["conv_id", "cluster_id"])
    return pd.DataFrame([clustering_agreement(out["entities"], gold)])


def _q_er_golden_records(sf_dir: str):
    """Survivorship: one merged golden record per predicted entity
    (stable-id + most-complete-record + additive rules — see
    stages/survivorship.py). All-integer/string output; the oracle
    re-derives the partition via the recursive-CTE closure and the
    member text masses via the same string_agg assembly."""
    from ember_ray.stages.survivorship import golden_records

    out = _export_er_graph(sf_dir)  # exports er_edges for _CC_SQL
    return golden_records(out["conversations"], out["entities"])


def _q_er_incremental(sf_dir: str):
    """Incremental ER admission: every NEW conversation (deterministic
    ``conv_id LIKE '%0'`` stand-in, ≈10%) matched independently against
    the OLD corpus's entity catalog (closure over old-old edges only).
    The above-threshold (new, old, score) candidates are exported, so
    DuckDB independently re-derives the old catalog (recursive-CTE
    closure over the suffix-filtered edges), the per-new argmax
    (score DESC, old_id ASC), and the final assignment."""
    import os

    from ember_ray.pipelines.er_incremental import incremental_match

    out = _export_er_graph(sf_dir)  # exports er_edges + links transcripts
    return incremental_match(
        out["scored"], out["conversations"], threshold=_er_cfg().threshold,
        export_candidates=os.path.join(_SIDE_DIR, "er_inc_cands"))


def _q_er_review_queue(sf_dir: str, band: float = 0.1, k: int = 200):
    """Active-learning review queue: the k candidate pairs whose score
    lies closest to the decision threshold (within ±band) — the pairs a
    human labeler or threshold-tuning pass should see first. Per-batch
    local top-k partials (each batch emits ≤ k rows), one bounded
    driver merge of k × n_batches rows — the ann_topk shape. The
    engine-computed scores are exported with er_pairs, so DuckDB
    re-derives band membership, the uncertainty ordering, and the
    cut independently; uncertainty = abs(score − τ) is the identical
    float expression on both engines (no rounding)."""
    import pandas as pd

    out = _export_er_graph(sf_dir)  # exports er_pairs incl. score
    tau = _er_cfg().threshold
    scored = out["scored"].select_columns(
        ["conv_id_left", "conv_id_right", "score"])

    def part(t: "pa.Table"):
        import numpy as np
        import pyarrow as pa

        s = np.asarray(t["score"], np.float64)
        d = np.abs(s - tau)
        keep = d <= band
        tt = t.filter(pa.array(keep))
        if tt.num_rows == 0:
            return pa.table({"conv_id_left": pa.array([], pa.string()),
                             "conv_id_right": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64()),
                             "uncertainty": pa.array([], pa.float64())})
        df = tt.to_pandas()
        df["uncertainty"] = d[keep]
        df = df.sort_values(
            ["uncertainty", "conv_id_left", "conv_id_right"]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = scored.map_batches(part, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    return (parts.sort_values(["uncertainty", "conv_id_left",
                               "conv_id_right"])
            .head(k).reset_index(drop=True))


def _q_er_consistency_report(sf_dir: str):
    """Per-entity cohesion audit: intra-entity candidate pairs split into
    direct edges (score ≥ τ) vs transitivity-forced merges (score < τ),
    with order-independent min/max scores (stages/evaluate.py
    entity_cohesion). DuckDB re-derives the partition via the
    recursive-CTE closure and every count/extremum from the exported
    pair scores — all-int64 counts + bitwise float extrema, no
    rounding."""
    from ember_ray.stages.evaluate import entity_cohesion

    out = _export_er_graph(sf_dir)  # exports er_pairs + er_edges
    return entity_cohesion(out["scored"], out["entities"],
                           threshold=_er_cfg().threshold)


def _q_er_summary(sf_dir: str):
    """Resolution summary card: conversation/entity/singleton counts,
    max cluster size, and mean cluster size (raw int64 quotient —
    bitwise). One groupby to sizes + one-row per-batch partials; the
    oracle re-derives everything through the recursive-CTE closure."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Count

    ents = _export_er_graph(sf_dir)["entities"]
    sizes = ents.groupby("entity_id").aggregate(Count(alias_name="size"))

    def part(t: "pa.Table") -> "pa.Table":
        s = np.asarray(t["size"], np.int64)
        return pa.table({
            "n_conversations": pa.array([int(s.sum())], pa.int64()),
            "n_entities": pa.array([len(s)], pa.int64()),
            "n_singletons": pa.array([int(np.sum(s == 1))], pa.int64()),
            "max_cluster_size": pa.array(
                [int(s.max()) if len(s) else 0], pa.int64()),
        })

    tot = {"n_conversations": 0, "n_entities": 0, "n_singletons": 0,
           "max_cluster_size": 0}
    for row in sizes.map_batches(part, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all():
        for k in ("n_conversations", "n_entities", "n_singletons"):
            tot[k] += row[k]
        tot["max_cluster_size"] = max(tot["max_cluster_size"],
                                      row["max_cluster_size"])
    tot["mean_cluster_size"] = (tot["n_conversations"] / tot["n_entities"]
                                if tot["n_entities"] else 0.0)
    return pd.DataFrame([tot])


def _q_er_match_weights(sf_dir: str):
    """Fellegi–Sunter m/u agreement probabilities per comparison feature
    (stages/evaluate.py match_weights): supervised counts over the
    candidate pairs with gold labels — exact int64 counts + raw int64
    quotients (bitwise; log-weights left to the consumer because
    transcendentals are not bit-stable across engines). DuckDB
    recomputes all three features from the raw transcripts via the
    bitwise er_similarity_verify recipe."""
    import os

    import ray.data as rd

    from ember_ray.stages.evaluate import match_weights

    out = _export_er_graph(sf_dir)  # exports er_pairs + links gold
    gold = rd.read_parquet(
        os.path.join(_er_corpus(sf_dir), "gold_clusters.parquet"),
        columns=["conv_id", "cluster_id"])
    return match_weights(
        out["scored"], gold,
        cutoffs={"jaccard": 0.5, "jaro_winkler": 0.9, "levenshtein": 0.8})


def _q_er_score_calibration(sf_dir: str):
    """Score-bin × gold-label counts over the candidate pairs (floor
    2%-bins) — the exact-integer calibration table behind threshold
    selection. DuckDB re-derives bins and both counts from the exported
    scores + the gold table."""
    import os

    import ray.data as rd

    from ember_ray.stages.evaluate import score_calibration

    out = _export_er_graph(sf_dir)  # exports er_pairs incl. score
    gold = rd.read_parquet(
        os.path.join(_er_corpus(sf_dir), "gold_clusters.parquet"),
        columns=["conv_id", "cluster_id"])
    return score_calibration(out["scored"], gold)


def _q_er_threshold_sweep(sf_dir: str):
    """Pair-level precision/recall at every candidate threshold k/50
    (stages/evaluate.py threshold_sweep): suffix sums over the exact
    calibration bin table + a gold C(n,2) denominator. All-integer counts
    and single-division ratios — bitwise on both engines. DuckDB
    re-derives bins, suffix sums and all three ratios from the exported
    scores + the gold table."""
    import os

    import ray.data as rd

    from ember_ray.stages.evaluate import threshold_sweep

    out = _export_er_graph(sf_dir)  # exports er_pairs incl. score
    gold = rd.read_parquet(
        os.path.join(_er_corpus(sf_dir), "gold_clusters.parquet"),
        columns=["conv_id", "cluster_id"])
    return threshold_sweep(out["scored"], gold)


_ER_FS_CUTOFFS = {"jaccard": 0.5, "jaro_winkler": 0.9, "levenshtein": 0.8}


def _q_er_agreement_patterns(sf_dir: str):
    """Counts of the 2^3 feature-agreement patterns over the candidate
    pairs (stages/evaluate.py agreement_patterns) — the Fellegi–Sunter
    sufficient statistic, computed with NO gold labels. Pure int64;
    DuckDB recomputes all three features bitwise from the raw
    transcripts and packs the same bits."""
    from ember_ray.stages.evaluate import agreement_patterns

    out = _export_er_graph(sf_dir)  # exports er_pairs + transcripts
    return agreement_patterns(out["scored"], cutoffs=_ER_FS_CUTOFFS)


def _q_er_em_weights(sf_dir: str):
    """Unsupervised Fellegi–Sunter m/u/λ via EM over the agreement
    patterns (stages/evaluate.py em_weights — the Splink-style core; no
    gold anywhere). Iterative float math is not SQL-expressible →
    rows-only; the pattern-count input has its own bitwise oracle
    (er_agreement_patterns) and EM accuracy is pinned by a
    planted-mixture pytest."""
    from ember_ray.stages.evaluate import agreement_patterns, em_weights

    out = _export_er_graph(sf_dir)
    pats = agreement_patterns(out["scored"], cutoffs=_ER_FS_CUTOFFS)
    return em_weights(pats.to_pandas(), feats=sorted(_ER_FS_CUTOFFS))


def _q_er_fs_scores(sf_dir: str):
    """Per-pair Fellegi–Sunter log-odds from the UNSUPERVISED EM weights
    (stages/evaluate.py fs_scores) — the full Splink-style linkage loop:
    pattern counts → EM m/u/λ → log2 weight table (driver, exported as
    doubles) → fixed-order weighted sum per pair. The oracle recomputes
    the features bitwise, reads the exported weights and writes the
    identical left-associated sum — bitwise parity with no
    transcendental evaluated per pair on either side."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.stages.evaluate import (agreement_patterns, em_weights,
                                           fs_scores, fs_weight_table)

    out = _export_er_graph(sf_dir)  # exports er_pairs + transcripts
    pats = agreement_patterns(out["scored"], cutoffs=_ER_FS_CUTOFFS)
    em = em_weights(pats.to_pandas(), feats=sorted(_ER_FS_CUTOFFS))
    w = fs_weight_table(em)
    os.makedirs(_SIDE_DIR, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(w, preserve_index=False),
                   os.path.join(_SIDE_DIR, "er_fs_weights.parquet"))
    return fs_scores(out["scored"], w, cutoffs=_ER_FS_CUTOFFS)


def _q_er_threshold_stability(sf_dir: str):
    """Entity-count + split/merge sensitivity at τ±0.05
    (stages/cluster.py threshold_stability): the same scored pairs
    clustered at 0.65/0.70/0.75 (τ=0.7 is the flagship cfg threshold;
    the grid is hardcoded to keep the literals identical to the static
    oracle SQL). All-int64 one-row card. DuckDB re-derives all three
    partitions via recursive-CTE closures over the exported scores and
    recomputes both refinement counts."""
    from ember_ray.stages.cluster import threshold_stability

    out = _export_er_graph(sf_dir)  # exports er_pairs incl. score
    return threshold_stability(
        out["scored"], out["conversations"].count(),
        thresholds=(0.65, 0.7, 0.75))


def _q_er_blocking_sweep(sf_dir: str):
    """Blocking-parameter sweep (stages/evaluate.py blocking_sweep):
    the same conversations re-blocked at 8/16/32 LSH bands (r = 8/4/2
    rows per band over 64 perms), one blocking_report row per config —
    the candidates-vs-recall tuning table. Per-config candidate pairs
    are exported so DuckDB re-derives every count and both
    single-division ratios from the exports + gold (the er_incremental
    evidence pattern: generation engine-side, arithmetic oracle-side)."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ember_ray.stages.evaluate import blocking_sweep

    out = _export_er_graph(sf_dir)  # links gold_clusters for the oracle
    gold = rd.read_parquet(
        os.path.join(_er_corpus(sf_dir), "gold_clusters.parquet"),
        columns=["conv_id", "cluster_id"])
    df, exports = blocking_sweep(out["conversations"], gold,
                                 band_grid=(8, 16, 32),
                                 seed=_er_cfg().seed,
                                 max_block_size=_er_cfg().max_block_size)
    for nb, ds in exports.items():
        path = os.path.join(_SIDE_DIR, f"blocking_sweep_b{nb}")
        shutil.rmtree(path, ignore_errors=True)
        ds.write_parquet(path)
        if not any(f.endswith(".parquet") for f in os.listdir(path)):
            # empty candidate set: write a schema'd empty file so the
            # oracle's glob still resolves
            pq.write_table(
                pa.schema([("conv_id_left", pa.string()),
                           ("conv_id_right", pa.string())]).empty_table(),
                os.path.join(path, "empty.parquet"))
    return df


def _side_link(name: str, target: str) -> None:
    """Atomically (re)point ``_SIDE_DIR/name`` at ``target`` so the static
    oracle SQL can read the per-sf synthetic corpus parquet."""
    import os

    os.makedirs(_SIDE_DIR, exist_ok=True)
    link = os.path.join(_SIDE_DIR, name)
    tmp = link + ".tmp"
    try:
        os.remove(tmp)
    except FileNotFoundError:
        pass
    os.symlink(target, tmp)
    os.replace(tmp, link)


def _q_er_conversations(sf_dir: str):
    import os

    from ember_ray.pipelines.er import _as_dataset
    from ember_ray.stages.assemble import assemble_conversations

    corpus = _er_corpus(sf_dir)
    # expose the (deterministic, content-addressed) transcript table to
    # the DuckDB oracle, which re-derives the assembly independently
    _side_link("transcripts", os.path.join(corpus, "transcripts.parquet"))
    return assemble_conversations(_as_dataset(corpus), num_buckets=16)


def _q_dedup_simhash_verify(sf_dir: str):
    """dedup_simhash with the candidate pair ids + fingerprint table
    exported so DuckDB independently recomputes the verify stage —
    ``bit_count(xor(fp_a, fp_b)) <= k`` is pure integer arithmetic, so
    parity is exact. The sketch/banding candidate generation has no SQL
    equivalent (covered by pytest)."""
    import os

    from ember_ray.pipelines import dedup

    return dedup.dedup_simhash(
        sf_dir, export=os.path.join(_SIDE_DIR, "simhash"))


def _q_dedup_embedding_verify(sf_dir: str):
    """dedup_embedding with the candidate pair ids exported so DuckDB
    independently recomputes the cosine verify over the embeddings table
    (``list_cosine_similarity`` with both sides cast ::DOUBLE[] — the
    ann_topk float32 lesson). The random-hyperplane bucket generation has
    no SQL equivalent (covered by pytest)."""
    import os

    from ember_ray.pipelines import dedup

    return dedup.dedup_embedding(
        sf_dir, export_candidates=os.path.join(_SIDE_DIR, "emb_candidates"))


def _q_semdedup(sf_dir: str):
    """semdedup with the k-means cell assignment exported so DuckDB
    re-derives the ENTIRE prune decision independently: intra-cell
    self-join on the embeddings table, ``list_cosine_similarity`` with
    ``::DOUBLE[]`` casts, the shared round-at-1e6 recipe, and the same
    keep-lowest-vec_id rule. Only the k-means assignment itself is
    non-SQL (deterministic — covered by the partition-invariance
    pytest)."""
    import os

    from ember_ray.pipelines import dedup

    return dedup.semdedup(
        sf_dir, export_assign=os.path.join(_SIDE_DIR, "semdedup_assign"))


def _q_ann_lsh_verify(sf_dir: str):
    """ann_topk_lsh with the merged candidate ids exported so DuckDB
    independently recomputes the cosines (::DOUBLE[] casts + the shared
    round-at-1e6) and re-derives the global top-k with the same
    (cosine DESC, vec_id ASC) ordering. The sign-sketch bucket probe has
    no SQL equivalent (recall is pytest-gated vs the exact path)."""
    import os

    from ember_ray.pipelines import ann

    return ann.ann_topk_lsh(
        sf_dir, export_candidates=os.path.join(_SIDE_DIR, "ann_lsh_candidates"))


def _q_ann_ivf_verify(sf_dir: str):
    """ann_topk_ivf with exported candidates — same verify contract as
    :func:`_q_ann_lsh_verify` for the IVF probe path."""
    import os

    from ember_ray.pipelines import ann

    return ann.ann_topk_ivf(
        sf_dir, export_candidates=os.path.join(_SIDE_DIR, "ann_ivf_candidates"))


def _q_dedup_incremental(sf_dir: str):
    """dedup_incremental with the LSH candidates exported so DuckDB
    re-verifies (Jaccard >= tau), re-filters to batch-vs-old pairs and
    re-derives the per-new-doc admission verdict end-to-end."""
    import os

    from ember_ray.pipelines import dedup

    return dedup.dedup_incremental(
        sf_dir,
        export_candidates=os.path.join(_SIDE_DIR, "minhash_candidates_inc"))


def _q_dedup_minhash_verify(sf_dir: str):
    """dedup_minhash with the candidate pair ids exported so DuckDB
    independently recomputes the verify stage (exact token Jaccard ≥ τ)
    over them — the LSH candidate generation itself is sketch-based and
    has no SQL equivalent (checked by its own pytest instead)."""
    import os

    from ember_ray.pipelines import dedup

    return dedup.dedup_minhash(
        sf_dir, export_candidates=os.path.join(_SIDE_DIR, "minhash_candidates")
    )


def _q_dedup_minhash_clusters(sf_dir: str):
    """Near-dup cluster canonicalization: candidates exported; the DuckDB
    oracle re-verifies them (Jaccard ≥ τ) and re-derives the transitive
    closure with a recursive-CTE min-label walk (the er_entities U3
    pattern), so canonical assignment is checked end-to-end."""
    import os

    from ember_ray.pipelines import dedup

    return dedup.dedup_minhash_clusters(
        sf_dir,
        export_candidates=os.path.join(_SIDE_DIR, "minhash_candidates_cl"))


_BENCH_CACHE: dict[str, dict] = {}


def _bench_run(sf_dir: str) -> dict:
    corpus = _er_corpus(sf_dir)
    if corpus not in _BENCH_CACHE:
        from ember_ray.pipelines.benchmark import build_labeled_pairs

        _BENCH_CACHE[corpus] = build_labeled_pairs(corpus, num_buckets=16)
    return _BENCH_CACHE[corpus]


def _q_bench_pairs_all(sf_dir: str):
    return _bench_run(sf_dir)["all"]


def _q_bench_pairs_train(sf_dir: str):
    return _bench_run(sf_dir)["train"]


_IMB_CACHE: dict[str, dict] = {}


def _imb_run(sf_dir: str) -> dict:
    corpus = _er_corpus(sf_dir)
    if corpus not in _IMB_CACHE:
        from ember_ray.pipelines.benchmark import build_imbalanced

        _IMB_CACHE[corpus] = build_imbalanced(
            corpus, num_buckets=16, balanced=_bench_run(sf_dir)
        )
    return _IMB_CACHE[corpus]


def _q_bench_scenario_counts(sf_dir: str):
    """Per-split pair counts, with every split table EXPORTED as tagged
    parquet so DuckDB independently counts the materialized rows
    (count-only oracle, VERDICT r2 #7 — the split populations themselves
    are xxhash-derived and not SQL-derivable; membership/ratio/disjointness
    rules are pytest-covered in tests/test_benchmark.py)."""
    import os
    import shutil

    import pandas as pd
    import pyarrow as pa

    import pyarrow.parquet as pq

    from ember_ray.util import dataset_to_arrow

    b = _bench_run(sf_dir)
    imb = _imb_run(sf_dir)
    names = ("train", "val", "test", "test_rl", "test_cfm", "test_om")
    splits = [(n, b[n]) for n in names] + [(n, imb[n]) for n in sorted(imb)]
    root = os.path.join(_SIDE_DIR, "bench_splits")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    rows = []
    for name, ds in splits:
        tbl = dataset_to_arrow(ds.materialize())  # gate-sf splits are small
        pq.write_table(
            tbl.append_column(
                "split", pa.array([name] * tbl.num_rows, pa.string())),
            os.path.join(root, f"{name}.parquet"),
        )
        rows.append((name, tbl.num_rows))
    # names manifest: lets the SQL count an EMPTY split as an explicit 0
    # row instead of silently dropping it from the GROUP BY
    pq.write_table(
        pa.table({"split": pa.array([r[0] for r in rows], pa.string())}),
        os.path.join(_SIDE_DIR, "bench_split_names.parquet"),
    )
    return pd.DataFrame(
        {"split": [r[0] for r in rows], "n_pairs": [r[1] for r in rows]}
    )


def _q_bench_ratio_counts(sf_dir: str):
    """Per-(ratio-dataset, label) pair counts for the varying pos:neg
    train constructor (reference ``build_ali_dataset_ratio_train.py:294``,
    k ∈ {9,19,39,79,99} → 1:k) — each ratio dataset EXPORTED as tagged
    parquet so DuckDB independently counts the materialized rows per
    label, which certifies the 1:k ratio itself (count-only oracle; the
    selection is content-hash-derived and not SQL-derivable; ratio /
    split / determinism rules are pytest-covered)."""
    import os
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ember_ray.pipelines.benchmark import build_ratio_train
    from ember_ray.util import dataset_to_arrow

    out = build_ratio_train(_er_corpus(sf_dir), num_buckets=16)
    root = os.path.join(_SIDE_DIR, "ratio_splits")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    rows = []
    for name in sorted(out):
        tbl = dataset_to_arrow(out[name].materialize())  # gate-sf: small
        pq.write_table(
            tbl.append_column(
                "name", pa.array([name] * tbl.num_rows, pa.string())),
            os.path.join(root, f"{name}.parquet"),
        )
        lab = tbl["label"].to_numpy(zero_copy_only=False)
        for v in (0, 1):
            rows.append((name, v, int((lab == v).sum())))
    return pd.DataFrame(
        {
            "name": [r[0] for r in rows],
            "label": pd.array([r[1] for r in rows], dtype="int64"),
            "n_pairs": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )


def _q_bench_pairs_imbalanced(sf_dir: str):
    """Union of the four 1:99 imbalanced test sets (reference
    test_i/irl/icfm/iom, build_ali_dataset.py:311-327)."""
    imb = _imb_run(sf_dir)
    names = sorted(imb)
    ds = imb[names[0]]
    for n in names[1:]:
        ds = ds.union(imb[n])
    return ds


def queries() -> dict[str, Callable[[str], Any]]:
    from ember_ray.pipelines import (ann, curation, dedup, multimodal,
                                     relational, search, sketches, temporal,
                                     textops)

    # ORDERING CONTRACT (VERDICT r3 #1, ROTATED r5 per VERDICT r4 #5):
    # the driver checks exactly the FIRST 50 keys — all 50 in-window
    # entries are oracle-exact, ending with the sixteen er_* queries
    # (five flagships + the round-5 ER additions: blocking / clustering
    # / survivorship / incremental / review-queue / calibration /
    # consistency / match-weights / summary / threshold-sweep /
    # agreement-patterns / fs-scores / threshold-stability — this IS
    # the entity_resolution tier, so the new ER ops earn driver rows).
    # Eleven r01-r04-green veterans (filter_project, groupby_count,
    # distinct, semi_join, anti_join, union_dedup, asof_join,
    # range_join, sessionize, quality_filter, shard_pack) are demoted
    # to just past the window; they remain in the full
    # tools/check_oracles.py sweep.
    return {
        # --- kept veterans: core relational (SURVEY §2) -------------------
        "join_agg": relational.join_agg,                    # J1/J2 analog
        "topk": relational.topk,                            # O3
        "assembly": relational.assembly,                    # A1 analog
        "pricing_summary": relational.pricing_summary,      # partial+final agg
        # --- kept veterans: sketches / text -------------------------------
        "distinct_count": sketches.distinct_count,
        "group_quantiles": sketches.group_quantiles,
        "token_count": textops.token_count,
        # --- kept veterans: dedup / ANN -----------------------------------
        "dedup_exact": dedup.dedup_exact,
        "dedup_substring": dedup.dedup_substring,           # oracle-exact
        "semdedup": _q_semdedup,                            # oracle-exact
        "dedup_minhash_clusters": _q_dedup_minhash_clusters,  # closure oracle
        "ann_topk": ann.ann_topk,
        # --- r5 promotions: round-4 extension ops, first driver rows ------
        "bm25_topk": search.bm25_topk,                      # oracle-exact
        "bm25_multi": search.bm25_multi,                    # oracle-exact
        "rollup_agg": relational.rollup_agg,                # oracle-exact
        "global_rank": relational.global_rank,              # oracle-exact
        "validate_constraints": relational.validate_constraints,  # oracle-exact
        "table_diff": relational.table_diff,                # oracle-exact
        "upsert_merge": relational.upsert_merge,            # oracle-exact
        "curation_pipeline": curation.curation_pipeline,    # oracle-exact
        "decontaminate_ngram": curation.decontaminate_ngram,  # oracle-exact
        "session_funnel": temporal.session_funnel,          # oracle-exact
        "heavy_hitters": sketches.heavy_hitters,            # oracle-exact
        "tfidf_keywords": textops.tfidf_keywords,           # oracle-exact
        "pmi_collocations": textops.pmi_collocations,       # oracle-exact
        "vocab_topk": textops.vocab_topk,                   # oracle-exact
        "cooccurrence_pairs": relational.cooccurrence_pairs,  # oracle-exact
        "table_profile": relational.table_profile,          # oracle-exact
        "latest_order": relational.latest_order,            # oracle-exact
        "join_rows": relational.join_rows,                  # oracle-exact
        "full_join_counts": relational.full_join_counts,    # oracle-exact
        "group_size_histogram": relational.group_size_histogram,  # oracle-exact
        # --- flagship ER pipeline (synthetic transcripts) ----------------
        "er_conversations": _q_er_conversations,
        "er_similarity_verify": _q_er_similarity_verify,
        "er_entities": _q_er_entities,
        "er_metrics": _q_er_metrics,
        "er_cluster_sizes": _q_er_cluster_sizes,
        # --- round-5 ER additions (entity_resolution tier flagships) ------
        "er_blocking_report": _q_er_blocking_report,        # oracle-exact
        "er_clustering_report": _q_er_clustering_report,    # oracle-exact
        "er_golden_records": _q_er_golden_records,          # oracle-exact
        "er_incremental": _q_er_incremental,                # oracle-exact
        "er_review_queue": _q_er_review_queue,              # oracle-exact
        "er_score_calibration": _q_er_score_calibration,    # oracle-exact
        "er_consistency_report": _q_er_consistency_report,  # oracle-exact
        "er_match_weights": _q_er_match_weights,            # oracle-exact
        # ==== past the driver's 50-key window (slots 1-50 above are ALL ====
        # ==== oracle-exact): r5-demoted veterans (green driver rows in  ====
        # ==== r01-r04, still swept by tools/check_oracles.py), then the ====
        # ==== remaining oracle-exact entries, then rows-only entries    ====
        # ==== whose verify companions are oracle-checked.               ====
        "er_summary": _q_er_summary,                        # oracle-exact
        "er_threshold_sweep": _q_er_threshold_sweep,        # oracle-exact
        "er_agreement_patterns": _q_er_agreement_patterns,  # oracle-exact
        "er_fs_scores": _q_er_fs_scores,                    # oracle-exact
        "er_threshold_stability": _q_er_threshold_stability,  # oracle-exact
        # --- just past the window: rows-only EM + demoted r04-green vets --
        "er_blocking_sweep": _q_er_blocking_sweep,          # oracle-exact
        "er_em_weights": _q_er_em_weights,                  # rows-only (EM)
        "asof_join": temporal.asof_join,                    # r04 green
        "range_join": temporal.range_join,                  # r04 green
        "sessionize": temporal.sessionize,                  # r04 green
        "quality_filter": curation.quality_filter,          # r04 green
        "shard_pack": curation.shard_pack,                  # r04 green
        "filter_project": relational.filter_project,        # M2/M4/M10 (r04 green)
        "groupby_count": relational.groupby_count,          # A2 (r04 green)
        "distinct": relational.distinct_values,             # A3 (r04 green)
        "semi_join": relational.semi_join,                  # J4 (r04 green)
        "anti_join": relational.anti_join,                  # J3 (r04 green)
        "union_dedup": relational.union_dedup,              # U1/U2 (r04 green)
        "group_size_filter": relational.group_size_filter,  # M5 (r04 green)
        "group_topk": relational.group_topk,                # O1/O2 (r04 green)
        "deterministic_split": relational.deterministic_split,  # O5 (r04 green)
        "regex_clean": relational.regex_clean,              # M6/F3 (r04 green)
        "overlap_stats": relational.overlap_stats,          # A5 (r04 green)
        "window_agg": relational.window_agg,                # r04 green
        "pivot_counts": relational.pivot_counts,            # r04 green
        "left_join_counts": relational.left_join_counts,    # r04 green
        "concat_cols": relational.concat_cols,              # M7/F4 (r04 green)
        "group_distinct_count": sketches.group_distinct_count,  # r04 green
        "lang_id": textops.lang_id,                         # r04 green (r5 demoted)
        "fingerprints": textops.fingerprints,               # r04 green (r5 demoted)
        "quality_scores": textops.quality_scores,           # r04 green
        "quality_by_lang": textops.quality_by_lang,         # r04 green
        "dedup_minhash_verify": _q_dedup_minhash_verify,    # r04 green
        "dedup_simhash_verify": _q_dedup_simhash_verify,    # r04 green
        "dedup_embedding_verify": _q_dedup_embedding_verify,  # r04 green
        "ann_topk_lsh_verify": _q_ann_lsh_verify,           # r04 green
        "ann_topk_ivf_verify": _q_ann_ivf_verify,           # r04 green
        "mm_payload_sizes": multimodal.payload_sizes,       # r04 green
        "bench_scenario_counts": _q_bench_scenario_counts,  # r04 green
        "bench_ratio_counts": _q_bench_ratio_counts,        # r04 green
        # --- remaining oracle-exact entries (full-sweep covered) ----------
        "ngram_counts": textops.ngram_counts,               # oracle-exact
        "rolling_agg": temporal.rolling_agg,                # oracle-exact
        "event_rank": temporal.event_rank,                  # oracle-exact
        "decontaminate": curation.decontaminate,            # oracle-exact
        "repetition_scores": textops.repetition_scores,     # oracle-exact
        "shuffle_order": curation.shuffle_order,            # oracle-exact
        "stratified_sample": curation.stratified_sample,    # oracle-exact
        "pii_scrub": curation.pii_scrub,                    # oracle-exact
        "detok_roundtrip": textops.detok_roundtrip,         # F5
        "payload_paths": textops.payload_paths,             # M8/F7
        "ann_topk_filtered": ann.ann_topk_filtered,         # oracle-exact
        "sliding_window_agg": relational.sliding_window_agg,  # oracle-exact
        "group_sample": curation.group_sample,              # oracle-exact
        "contamination_report": curation.contamination_report,  # oracle-exact
        "zscore_norm": textops.zscore_norm,                 # oracle-exact
        "dedup_containment": dedup.dedup_containment,       # oracle-exact
        "dedup_incremental": _q_dedup_incremental,          # oracle-exact
        "json_extract_agg": relational.json_extract_agg,    # oracle-exact
        "value_quartiles": relational.value_quartiles,      # oracle-exact
        "event_gaps": temporal.event_gaps,                  # oracle-exact
        "above_median_orders": relational.above_median_orders,  # oracle-exact
        "corr_by_type": relational.corr_by_type,            # oracle-exact
        "unpivot_counts": relational.unpivot_counts,        # oracle-exact
        "global_deciles": relational.global_deciles,        # oracle-exact
        "key_skew_report": relational.key_skew_report,      # oracle-exact
        "length_histogram": relational.length_histogram,    # oracle-exact
        "weighted_sample": curation.weighted_sample,        # oracle-exact
        "er_scored_pairs": _q_er_scored,              # rows-only (tfidf/score)
        "mm_features": multimodal.mm_features,              # rows-only
        "distinct_count_hll": sketches.distinct_count_hll,  # rows-only sketch
        "group_quantiles_sketch": sketches.group_quantiles_sketch,  # rows-only
        "dedup_minhash": dedup.dedup_minhash,               # rows-only
        "dedup_simhash": dedup.dedup_simhash,               # rows-only
        "dedup_ngram": dedup.dedup_ngram,                   # rows-only
        "dedup_embedding": dedup.dedup_embedding,           # rows-only
        "ann_topk_lsh": ann.ann_topk_lsh,                   # rows-only
        "ann_topk_ivf": ann.ann_topk_ivf,                   # rows-only
        "bench_pairs_all": _q_bench_pairs_all,
        "bench_pairs_train": _q_bench_pairs_train,
        "bench_pairs_imbalanced": _q_bench_pairs_imbalanced,
    }


def _bm25_multi_sql(norm: str, k: int = 5) -> str:
    """Generated per-query BM25 CTEs over the SAME unique-term tf/idf
    columns the Ray kernel computes, each query summing ITS terms
    left-to-right (float parity with bm25_topk's hand-written form),
    per-query rounded-score top-k, UNION ALL."""
    from ember_ray.pipelines.search import MULTI_QUERIES

    per_query = [[t for t in q.split() if t] for q in MULTI_QUERIES]
    uniq = []
    for terms in per_query:
        for t in terms:
            if t not in uniq:
                uniq.append(t)
    tf_cols = ", ".join(
        f"len(list_filter(tk, x -> x = '{t}'))::DOUBLE AS tf{j}"
        for j, t in enumerate(uniq))
    idf_cols = ", ".join(
        f"ln((count(*)::DOUBLE - sum((tf{j} > 0)::INT)::DOUBLE + 0.5) / "
        f"(sum((tf{j} > 0)::INT)::DOUBLE + 0.5) + 1.0) AS idf{j}"
        for j in range(len(uniq)))
    tix = {t: j for j, t in enumerate(uniq)}
    parts = []
    for qi, terms in enumerate(per_query):
        expr = " + ".join(
            f"idf{tix[t]} * (tf{tix[t]} * 2.2) / (tf{tix[t]} + 1.2 * "
            "(1.0 - 0.75 + 0.75 * dl / avgdl))" for t in terms)
        parts.append(
            f"t{qi} AS (SELECT {qi}::BIGINT AS query_id, doc_id, "
            f"round(raw * 1000000) / 1000000 AS score FROM "
            f"(SELECT doc_id, {expr} AS raw FROM e, s WHERE raw > 0.0) "
            f"ORDER BY score DESC, doc_id LIMIT {k})")
    union = " UNION ALL ".join(f"SELECT * FROM t{qi}"
                               for qi in range(len(per_query)))
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(" + norm +
        ", ' '), x -> x <> '') AS tk FROM documents), "
        f"e AS (SELECT doc_id, len(tk)::DOUBLE AS dl, {tf_cols} FROM d), "
        "s AS (SELECT sum(dl) / count(*)::DOUBLE AS avgdl, "
        f"{idf_cols} FROM e), "
        + ", ".join(parts) +
        f" {union} ORDER BY query_id, score DESC, doc_id"
    )


def _stratified_sample_sql(norm: str) -> str:
    # per-lang thresholds from the SAME python constants the Ray op uses;
    # 8-hex-char prefixes compare identically as strings in both engines
    from ember_ray.pipelines.curation import (SAMPLE_FRACS, _DEFAULT_FRAC,
                                              frac_threshold_hex)

    case = ("CASE lang " + " ".join(
        f"WHEN '{k}' THEN '{frac_threshold_hex(v)}'"
        for k, v in SAMPLE_FRACS.items())
        + f" ELSE '{frac_threshold_hex(_DEFAULT_FRAC)}' END")
    return ("SELECT doc_id, lang FROM documents "
            "WHERE substring(md5(" + norm + "), 1, 8) < " + case)


def _pii_scrub_sql() -> str:
    # staged scrub composed from the SAME PII_PATTERNS constants the Ray
    # kernel applies (both engines are RE2 — bitwise-identical matches);
    # counts are taken per pattern on the progressively scrubbed text,
    # exactly like functions.text.scrub_pii
    from ember_ray.functions.text import PII_PATTERNS

    contact = ("c_name || ' <' || lower(c_mktsegment) || '.' || c_custkey"
               " || '@example.com> ext 555-'"
               " || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')")
    expr = "contact"
    counts = []
    for pat, repl in PII_PATTERNS:
        counts.append(f"(len(regexp_split_to_array({expr}, '{pat}')) - 1)")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return (f"WITH c AS (SELECT c_custkey, {contact} AS contact "
            "FROM customer) "
            f"SELECT c_custkey, {expr} AS contact, "
            f"CAST({' + '.join(counts)} AS BIGINT) AS n_pii FROM c")


def oracle_sql() -> dict[str, str]:
    stop = "('the','a','of','and','to')"
    # normalization recipe, kept textually in sync with
    # ember_ray.functions.text.normalize (flatten attrs → lower → collapse
    # punctuation/whitespace → trim)
    norm = (
        "trim(regexp_replace(lower(replace(replace(text,'#;#',' '),"
        "'#:#',' ')), '[\\s.,;:!?()\\[\\]{}\"'']+', ' ', 'g'))"
    )
    toks = (
        "list_distinct(list_filter(string_split(" + norm + ", ' '), "
        "x -> x <> ''))"
    )

    # er_blocking_sweep: per-config counts from the exported candidate
    # sets + single-division ratios written exactly as the Python side
    # computes them (the er_incremental evidence pattern)
    _bs_ctes = "".join(
        f"c{b} AS (SELECT count(*)::BIGINT AS cand, "
        "coalesce(sum((gl.cluster_id = gr.cluster_id)::INT), 0)::BIGINT "
        f"AS m FROM read_parquet('{_SIDE_DIR}/blocking_sweep_b{b}/*.parquet') p "
        "JOIN g gl ON gl.conv_id = p.conv_id_left "
        "JOIN g gr ON gr.conv_id = p.conv_id_right), "
        for b in (8, 16, 32)
    )
    _bs_selects = " UNION ALL ".join(
        f"SELECT {b}::BIGINT AS num_bands, {64 // b}::BIGINT AS rows_per_band, "
        "nr.n AS n_records, c.cand AS n_candidates, "
        "gp.gold_pairs AS n_gold_pairs, c.m AS n_matched, "
        "CASE WHEN gp.gold_pairs = 0 THEN 0.0 ELSE c.m / gp.gold_pairs END "
        "AS pairs_completeness, "
        "CASE WHEN nr.n * (nr.n - 1) // 2 = 0 THEN 0.0 "
        "ELSE 1.0 - (c.cand / (nr.n * (nr.n - 1) // 2)) END "
        f"AS reduction_ratio FROM c{b} c, gp, nr"
        for b in (8, 16, 32)
    )
    blocking_sweep_sql = (
        "WITH g AS (SELECT conv_id, cluster_id "
        f"FROM read_parquet('{_SIDE_DIR}/gold_clusters')), "
        "nr AS (SELECT count(*)::BIGINT AS n FROM g), "
        "gp AS (SELECT coalesce(sum(k * (k - 1) // 2), 0)::BIGINT "
        "AS gold_pairs FROM (SELECT count(*)::BIGINT AS k FROM g "
        "GROUP BY cluster_id)), "
        + _bs_ctes.rstrip(", ") + " " + _bs_selects
    )

    from ember_ray.pipelines.textops import LangId

    def _cnt(g: str) -> str:
        esc = g.replace("'", "''")
        return f"(len(s)-len(replace(s,'{esc}','')))/{len(g)}"

    lang_cols = ", ".join(
        " + ".join(_cnt(g) for g in LangId.PROFILES[lang]) + f" AS {lang}"
        for lang in ("en", "de", "fr", "es")
    )
    lang_sql = (
        "WITH t AS (SELECT doc_id, lower(coalesce(text,'')) AS s FROM documents), "
        f"c AS (SELECT doc_id, s, {lang_cols} FROM t) "
        "SELECT doc_id, CASE "
        "WHEN regexp_matches(substring(s, 1, 200), '[一-鿿]') THEN 'zh' "
        "WHEN en >= de AND en >= fr AND en >= es THEN 'en' "
        "WHEN de >= fr AND de >= es THEN 'de' "
        "WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang_pred FROM c"
    )
    return {
        "quality_filter": (
            # bounds rounded with the shared rint recipe on BOTH sides so
            # boundary comparisons are bitwise-identical (CLAUDE.md)
            "WITH b AS (SELECT lang,"
            " round(quantile_cont(n_chars, 0.05)*1000000)/1000000 AS lo,"
            " round(quantile_cont(n_chars, 0.95)*1000000)/1000000 AS hi"
            " FROM documents GROUP BY lang)"
            " SELECT d.doc_id, d.lang, d.n_chars FROM documents d"
            " JOIN b USING (lang)"
            " WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi"
        ),
        "shard_pack": (
            "SELECT doc_id, n_chars, CAST(floor(coalesce(sum(n_chars)"
            " OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " 1 PRECEDING), 0) / 100000) AS BIGINT) AS shard_id"
            " FROM documents"
        ),
        "distinct_count": (
            "SELECT count(DISTINCT user_id) AS n_distinct FROM events"
        ),
        "group_distinct_count": (
            "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct "
            "FROM events GROUP BY event_type"
        ),
        "dedup_minhash_clusters": (
            # candidates re-verified (exact token Jaccard ≥ 0.8, the
            # dedup_minhash_verify recipe) then closed transitively with
            # the recursive min-label walk (the er_entities U3 pattern);
            # singletons canonicalize to themselves via the seed rows
            "WITH RECURSIVE cand AS (SELECT * FROM "
            f"read_parquet('{_SIDE_DIR}/minhash_candidates_cl/*.parquet')), "
            f"d AS (SELECT doc_id, {toks} AS tk FROM documents), "
            "e AS (SELECT c.doc_id_left AS src, c.doc_id_right AS dst "
            "FROM cand c JOIN d a ON a.doc_id = c.doc_id_left "
            "JOIN d b ON b.doc_id = c.doc_id_right "
            "WHERE len(list_intersect(a.tk, b.tk)) * 1.0 / "
            "nullif(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)), 0)"
            " >= 0.8), "
            "sym AS (SELECT src AS a, dst AS b FROM e "
            "UNION SELECT dst, src FROM e), "
            "walk(node, label) AS ("
            "SELECT doc_id, doc_id FROM documents UNION "
            "SELECT s.b, w.label FROM walk w JOIN sym s ON s.a = w.node "
            "WHERE w.label < s.b) "
            "SELECT node AS doc_id, min(label) AS canonical_id "
            "FROM walk GROUP BY node"
        ),
        "heavy_hitters": (
            # exact top-k tokens (the MG two-pass output IS exact when the
            # bound holds; the pipeline raises otherwise) — NON-distinct
            # token stream, (count DESC, token ASC) tie-break both sides
            "WITH d AS (SELECT list_filter(string_split(" + norm + ", ' '), "
            "x -> x <> '') AS tk FROM documents), "
            "t AS (SELECT unnest(tk) AS token FROM d) "
            "SELECT token, count(*) AS n FROM t GROUP BY token "
            "ORDER BY n DESC, token LIMIT 20"
        ),
        "bm25_topk": (
            # BM25 over the NON-distinct normalized token stream. Float
            # parity: every per-term double op is written in the same
            # order the kernel computes it (idf*(tf*(k1+1))/(tf+norm),
            # terms summed left-to-right in query order), then the shared
            # rint recipe at 1e6; ordering is on the ROUNDED score
            "WITH d AS (SELECT doc_id, list_filter(string_split("
            + norm + ", ' '), x -> x <> '') AS tk FROM documents), "
            "e AS (SELECT doc_id, len(tk)::DOUBLE AS dl, "
            "len(list_filter(tk, x -> x = 'hash'))::DOUBLE AS tf0, "
            "len(list_filter(tk, x -> x = 'join'))::DOUBLE AS tf1, "
            "len(list_filter(tk, x -> x = 'order'))::DOUBLE AS tf2 "
            "FROM d), "
            "s AS (SELECT sum(dl) / count(*)::DOUBLE AS avgdl, "
            "count(*)::DOUBLE AS n, "
            "ln((count(*)::DOUBLE - sum((tf0 > 0)::INT)::DOUBLE + 0.5) / "
            "(sum((tf0 > 0)::INT)::DOUBLE + 0.5) + 1.0) AS idf0, "
            "ln((count(*)::DOUBLE - sum((tf1 > 0)::INT)::DOUBLE + 0.5) / "
            "(sum((tf1 > 0)::INT)::DOUBLE + 0.5) + 1.0) AS idf1, "
            "ln((count(*)::DOUBLE - sum((tf2 > 0)::INT)::DOUBLE + 0.5) / "
            "(sum((tf2 > 0)::INT)::DOUBLE + 0.5) + 1.0) AS idf2 FROM e), "
            "r AS (SELECT doc_id, "
            "idf0 * (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) "
            "+ idf1 * (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) "
            "+ idf2 * (tf2 * 2.2) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) "
            "AS raw FROM e, s WHERE raw > 0.0) "
            "SELECT doc_id, round(raw * 1000000) / 1000000 AS score FROM r "
            "ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "decontaminate": (
            # exact-match leakage screen: drop every doc whose NORMALIZED
            # md5 fingerprint appears in the held-out doc_id%97==0 subset
            "WITH ev AS (SELECT DISTINCT md5(" + norm + ") AS fp "
            "FROM documents WHERE doc_id % 97 = 0) "
            "SELECT doc_id, lang FROM documents "
            "WHERE md5(" + norm + ") NOT IN (SELECT fp FROM ev)"
        ),
        "stratified_sample": _stratified_sample_sql(norm),
        "contamination_report": (
            # per-eval-doc 5-gram leakage fraction: distinct grams per
            # eval doc vs the distinct corpus-side gram set; same gram
            # recipe as decontaminate_ngram; round-at-1e6 on the fraction
            "WITH d AS (SELECT doc_id, "
            "list_filter(string_split(" + norm + ", ' '), x -> x <> '') "
            "AS tk FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform("
            "range(1, len(tk) - 3), i -> tk[i] || ' ' || tk[i+1] || ' ' || "
            "tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) AS g "
            "FROM d WHERE len(tk) >= 5), "
            "ev AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 97 = 0), "
            "crp AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 <> 0), "
            "h AS (SELECT ev.doc_id, count(*) AS n_hit FROM ev "
            "JOIN crp USING (g) GROUP BY 1), "
            "tot AS (SELECT doc_id, count(*) AS n_grams FROM ev GROUP BY 1) "
            "SELECT t.doc_id, t.n_grams, coalesce(h.n_hit, 0) AS n_hit, "
            "round(coalesce(h.n_hit, 0) / CAST(t.n_grams AS DOUBLE) "
            "* 1000000) / 1000000 AS frac FROM tot t LEFT JOIN h USING (doc_id)"
        ),
        "decontaminate_ngram": (
            # 5-gram-collision fuzzy leakage screen: same token recipe as
            # ngram_counts (NON-distinct sequence); docs with < 5 tokens
            # have no grams and are kept
            "WITH d AS (SELECT doc_id, lang, "
            "list_filter(string_split(" + norm + ", ' '), x -> x <> '') "
            "AS tk FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform("
            "range(1, len(tk) - 3), i -> tk[i] || ' ' || tk[i+1] || ' ' || "
            "tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) AS g "
            "FROM d WHERE len(tk) >= 5), "
            "ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0), "
            "bad AS (SELECT DISTINCT doc_id FROM g "
            "WHERE g IN (SELECT g FROM ev)) "
            "SELECT doc_id, lang FROM documents "
            "WHERE doc_id NOT IN (SELECT doc_id FROM bad)"
        ),
        "repetition_scores": (
            # Gopher duplicate-3-gram counters; integer columns so the
            # comparison is exact — the dup fraction is derived downstream
            "WITH d AS (SELECT doc_id, "
            "list_filter(string_split(" + norm + ", ' '), x -> x <> '') "
            "AS tk FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN "
            "list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || "
            "tk[i+1] || ' ' || tk[i+2]) ELSE CAST([] AS VARCHAR[]) END "
            "AS gs FROM d) "
            "SELECT doc_id, len(gs)::BIGINT AS n_grams, "
            "len(list_distinct(gs))::BIGINT AS n_distinct FROM g"
        ),
        "shuffle_order": (
            # deterministic content-hash training order; doc_id breaks
            # exact-duplicate ties identically on both sides
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY "
            "md5(" + norm + "), doc_id) - 1 AS BIGINT) AS pos "
            "FROM documents"
        ),
        "curation_pipeline": (
            # the composed flow: quality band -> decontaminate -> exact
            # dedup (min doc_id per fp) -> shard pack, same recipes as the
            # individual ops' oracles
            "WITH b AS (SELECT lang,"
            " round(quantile_cont(n_chars, 0.05)*1000000)/1000000 AS lo,"
            " round(quantile_cont(n_chars, 0.95)*1000000)/1000000 AS hi"
            " FROM documents GROUP BY lang), "
            "ev AS (SELECT DISTINCT md5(" + norm + ") AS fp "
            "FROM documents WHERE doc_id % 97 = 0), "
            "q AS (SELECT d.doc_id, d.lang, d.n_chars, md5(" + norm + ") AS fp"
            " FROM documents d JOIN b USING (lang)"
            " WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi"
            " AND md5(" + norm + ") NOT IN (SELECT fp FROM ev)), "
            "dd AS (SELECT doc_id, lang, n_chars FROM q "
            "QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1) "
            "SELECT doc_id, lang, n_chars, CAST(floor(coalesce(sum(n_chars)"
            " OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " 1 PRECEDING), 0) / 100000) AS BIGINT) AS shard_id FROM dd"
        ),
        "pii_scrub": _pii_scrub_sql(),
        "group_sample": (
            # deterministic per-lang quota: n smallest (md5(norm), doc_id)
            "SELECT doc_id, lang FROM (SELECT doc_id, lang, "
            "row_number() OVER (PARTITION BY lang ORDER BY md5(" + norm +
            "), doc_id) AS rn FROM documents) WHERE rn <= 50"
        ),
        "ngram_counts": (
            # NON-distinct normalized token sequence (the tokenize_array
            # recipe without list_distinct) → 3-gram strings → top-50 by
            # (count DESC, ngram ASC) — deterministic tie-break both sides
            "WITH d AS (SELECT list_filter(string_split(" + norm + ", ' '), "
            "x -> x <> '') AS tk FROM documents), "
            "ng AS (SELECT unnest(list_transform(range(1, len(tk) - 1), "
            "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS ngram "
            "FROM d WHERE len(tk) >= 3) "
            "SELECT ngram, count(*) AS n FROM ng GROUP BY ngram "
            "ORDER BY n DESC, ngram LIMIT 50"
        ),
        "pmi_collocations": (
            # adjacent-token PMI with expression-identity parity:
            # ln((c*T*T)/(N*c1*c2)) left-to-right from exact int counts,
            # support floor 5, (pmi DESC, w1, w2) tie-break, top-50
            "WITH d AS (SELECT list_filter(string_split(" + norm + ", ' '), "
            "x -> x <> '') AS tk FROM documents), "
            "u AS (SELECT unnest(tk) AS w FROM d), "
            "uc AS (SELECT w, count(*) AS c FROM u GROUP BY w), "
            "tt AS (SELECT count(*) AS t FROM u), "
            "b AS (SELECT tk[CAST(i AS INT)] AS w1, "
            "tk[CAST(i AS INT) + 1] AS w2 FROM d, "
            "unnest(range(1, len(tk))) AS t(i)), "
            "nn AS (SELECT count(*) AS n FROM b), "
            "bc AS (SELECT w1, w2, count(*) AS c FROM b GROUP BY 1, 2 "
            "HAVING count(*) >= 5) "
            "SELECT bc.w1, bc.w2, bc.c AS n, "
            "round(ln((CAST(bc.c AS DOUBLE) * tt.t * tt.t) / "
            "(CAST(nn.n AS DOUBLE) * u1.c * u2.c)) * 1000000) / 1000000 "
            "AS pmi FROM bc JOIN uc u1 ON u1.w = bc.w1 "
            "JOIN uc u2 ON u2.w = bc.w2, tt, nn "
            "ORDER BY pmi DESC, w1, w2 LIMIT 50"
        ),
        "zscore_norm": (
            # expression-identity float parity: mu and sigma from the SAME
            # exact integer aggregates via the SAME IEEE operation
            # sequence ((ss - s*s/c)/c), then the shared round-at-1e6;
            # sigma=0 groups map to z=0
            "WITH m AS (SELECT lang, count(*) AS c, sum(n_chars) AS s, "
            "sum(n_chars * n_chars) AS ss FROM documents GROUP BY lang) "
            "SELECT d.doc_id, d.lang, "
            "CASE WHEN (m.ss - CAST(m.s AS DOUBLE) * m.s / m.c) / m.c <= 0 "
            "THEN 0.0 ELSE round((d.n_chars - CAST(m.s AS DOUBLE) / m.c) / "
            "sqrt((m.ss - CAST(m.s AS DOUBLE) * m.s / m.c) / m.c) "
            "* 1000000) / 1000000 END AS z "
            "FROM documents d JOIN m USING (lang)"
        ),
        "tfidf_keywords": (
            # per-doc top-3 TF-IDF: tf over the NON-distinct normalized
            # token sequence, df over distinct doc sets, score =
            # tf·ln(N/df) with the shared round-at-1e6 recipe, tie-break
            # (score DESC, token ASC) — byte-lex both engines (ASCII)
            "WITH tk AS (SELECT doc_id, unnest(list_filter(string_split("
            + norm + ", ' '), x -> x <> '')) AS token FROM documents), "
            "n AS (SELECT count(*) AS n FROM documents), "
            "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tk "
            "GROUP BY token), "
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM tk "
            "GROUP BY doc_id, token), "
            "s AS (SELECT tf.doc_id, tf.token, round(tf.tf * "
            "ln(CAST(n.n AS DOUBLE) / df.df) * 1000000) / 1000000 AS score "
            "FROM tf JOIN df USING (token), n), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, token) AS rn FROM s) "
            "SELECT doc_id, token, score FROM r WHERE rn <= 3"
        ),
        "rolling_agg": (
            # ROWS window, ordered (ts, event_id) — the same total order
            # the packed-key kernel sorts by. Half-UP floor rounding, not
            # the usual round() recipe: 2-decimal inputs put mean-of-2
            # EXACTLY on .005 boundaries where numpy rint (half-even) and
            # round (half-away) disagree; floor(x*100+0.5) is bit-identical
            "SELECT event_id, user_id, ts, "
            "count(*) OVER w::BIGINT AS roll_n, "
            "floor(sum(value) OVER w * 100 + 0.5)/100 AS roll_sum, "
            "floor(avg(value) OVER w * 100 + 0.5)/100 AS roll_mean "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        ),
        "event_rank": (
            # pure comparisons, no float arithmetic — no rounding needed
            "SELECT event_id, user_id, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY value DESC, event_id)::BIGINT AS value_row_number, "
            "dense_rank() OVER (PARTITION BY user_id "
            "ORDER BY value DESC)::BIGINT AS value_dense_rank FROM events"
        ),
        "pivot_counts": (
            "SELECT user_id, "
            + ", ".join(
                f"count(*) FILTER (WHERE event_type = '{t}') AS {t}"
                for t in ("click", "error", "purchase", "signup", "view")
            )
            + " FROM events GROUP BY user_id"
        ),
        "left_join_counts": (
            "SELECT c.c_custkey, c.c_mktsegment, "
            "coalesce(e.n_events, 0) AS n_events FROM customer c LEFT JOIN "
            "(SELECT user_id, count(*) AS n_events FROM events "
            "GROUP BY user_id) e ON c.c_custkey = e.user_id"
        ),
        "group_quantiles": (
            # interpolation + rounding recipe mirrored in
            # sketches._quantile_cont / _round recipe (CLAUDE.md)
            "SELECT event_type, count(*) AS n, "
            "round(quantile_cont(value, 0.5) * 1000000) / 1000000 AS p50, "
            "round(quantile_cont(value, 0.95) * 1000000) / 1000000 AS p95 "
            "FROM events GROUP BY event_type"
        ),
        "lang_id": lang_sql,
        "fingerprints": (
            f"SELECT doc_id, md5({norm}) AS fp FROM documents"
        ),
        "detok_roundtrip": (
            # tokenize→' '.join == the normalized text (single spaces)
            f"SELECT doc_id, {norm} AS detok FROM documents"
        ),
        "payload_paths": (
            "SELECT doc_id, (doc_id % 16)::VARCHAR || '/' || "
            "doc_id::VARCHAR || '.bin' AS path FROM documents"
        ),
        "er_conversations": (
            "SELECT conv_id, count(*) AS n_turns, "
            "string_agg(text, chr(10) ORDER BY turn_idx) AS text, "
            "arg_min(role, turn_idx) AS first_role, "
            "coalesce(string_agg(DISTINCT nullif(tool,''), ';' "
            "ORDER BY nullif(tool,'')), '') AS tools "
            f"FROM read_parquet('{_SIDE_DIR}/transcripts/*.parquet') "
            "GROUP BY conv_id"
        ),
        # ER tail, re-derived from exported pair ids + thresholded edges +
        # the raw corpus (VERDICT r2 #4). ``_CC_SQL`` is the WITH RECURSIVE
        # min-label closure (U3); conversation text is re-assembled from
        # transcripts exactly as in er_conversations.
        "er_similarity_verify": (
            "WITH conv AS (SELECT conv_id, "
            "string_agg(text, chr(10) ORDER BY turn_idx) AS text "
            f"FROM read_parquet('{_SIDE_DIR}/transcripts/*.parquet') "
            "GROUP BY conv_id), "
            f"p AS (SELECT * FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet')), "
            "s AS (SELECT p.conv_id_left, p.conv_id_right, "
            "substring(a.text, 1, 128) AS ta, substring(b.text, 1, 128) AS tb, "
            f"{toks.replace('text', 'a.text')} AS ka, "
            f"{toks.replace('text', 'b.text')} AS kb "
            "FROM p JOIN conv a ON a.conv_id = p.conv_id_left "
            "JOIN conv b ON b.conv_id = p.conv_id_right) "
            "SELECT conv_id_left, conv_id_right, "
            "coalesce(len(list_intersect(ka, kb)) * 1.0 / "
            "nullif(len(ka) + len(kb) - len(list_intersect(ka, kb)), 0), 0.0)"
            " AS jaccard, "
            "CASE WHEN ta = tb THEN 1.0 "
            "ELSE jaro_winkler_similarity(ta, tb) END AS jaro_winkler, "
            "CASE WHEN greatest(length(ta), length(tb)) = 0 THEN 1.0 "
            "ELSE 1.0 - levenshtein(ta, tb)::DOUBLE / "
            "greatest(length(ta), length(tb)) END AS levenshtein FROM s"
        ),
        "er_entities": (
            f"WITH RECURSIVE {_CC_SQL} SELECT conv_id, entity_id FROM ent"
        ),
        "er_cluster_sizes": (
            f"WITH RECURSIVE {_CC_SQL}, "
            "sizes AS (SELECT entity_id, count(*) AS size FROM ent "
            "GROUP BY entity_id) "
            "SELECT size, count(*) AS n_entities FROM sizes GROUP BY size"
        ),
        "er_metrics": (
            f"WITH RECURSIVE {_CC_SQL}, "
            "p AS (SELECT conv_id_left AS l, conv_id_right AS r "
            f"FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet')), "
            "g AS (SELECT conv_id, cluster_id "
            f"FROM read_parquet('{_SIDE_DIR}/gold_clusters')), "
            "j AS (SELECT (el.entity_id = er.entity_id) AS pred, "
            "(gl.cluster_id = gr.cluster_id) AS tru FROM p "
            "JOIN ent el ON el.conv_id = p.l "
            "JOIN ent er ON er.conv_id = p.r "
            "JOIN g gl ON gl.conv_id = p.l "
            "JOIN g gr ON gr.conv_id = p.r), "
            "c AS (SELECT "
            "sum(CASE WHEN pred AND tru THEN 1 ELSE 0 END)::BIGINT AS tp, "
            "sum(CASE WHEN pred AND NOT tru THEN 1 ELSE 0 END)::BIGINT AS fp, "
            "sum(CASE WHEN NOT pred AND tru THEN 1 ELSE 0 END)::BIGINT AS fn, "
            "sum(CASE WHEN NOT pred AND NOT tru THEN 1 ELSE 0 END)::BIGINT AS tn "
            "FROM j), "
            "m AS (SELECT tp, fp, fn, tn, "
            "CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision, "
            "CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall "
            "FROM c) "
            "SELECT precision, recall, CASE WHEN precision + recall = 0 "
            "THEN 0.0 ELSE 2 * precision * recall / (precision + recall) END "
            "AS f1, tp, fp, fn, tn FROM m"
        ),
        "er_blocking_report": (
            # floats are raw double quotients/subtractions of exact
            # BIGINTs — bitwise-identical across engines, no rounding
            # (the er_similarity_verify precedent)
            "WITH g AS (SELECT conv_id, cluster_id "
            f"FROM read_parquet('{_SIDE_DIR}/gold_clusters')), "
            "cand AS (SELECT conv_id_left, conv_id_right "
            f"FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet')), "
            "n AS (SELECT count(*) AS n_records FROM g), "
            "nc AS (SELECT count(*) AS n_candidates FROM cand), "
            "gp AS (SELECT CAST(sum((k * (k - 1)) // 2) AS BIGINT) "
            "AS n_gold_pairs FROM "
            "(SELECT count(*) AS k FROM g GROUP BY cluster_id)), "
            "m AS (SELECT count(*) AS n_matched FROM cand c "
            "JOIN g gl ON gl.conv_id = c.conv_id_left "
            "JOIN g gr ON gr.conv_id = c.conv_id_right "
            "WHERE gl.cluster_id = gr.cluster_id) "
            "SELECT n_records, n_candidates, n_gold_pairs, n_matched, "
            "n_matched::DOUBLE / n_gold_pairs AS pairs_completeness, "
            "1 - (n_candidates::DOUBLE / "
            "((n_records * (n_records - 1)) // 2)) AS reduction_ratio "
            "FROM n, nc, gp, m"
        ),
        "er_clustering_report": (
            # contingency table of the re-derived closure vs gold; ARI
            # from exact BIGINT pair masses via a pinned double
            # expression (bitwise); B³ sums are order-sensitive float
            # sums → house round-at-1e6 on P/R, F1 a pinned expression
            # of the two rounded values
            f"WITH RECURSIVE {_CC_SQL}, "
            "g AS (SELECT conv_id, cluster_id "
            f"FROM read_parquet('{_SIDE_DIR}/gold_clusters')), "
            "j AS (SELECT e.entity_id, g.cluster_id FROM ent e "
            "JOIN g ON g.conv_id = e.conv_id), "
            "ct AS (SELECT entity_id, cluster_id, count(*) AS nij "
            "FROM j GROUP BY entity_id, cluster_id), "
            "ep AS (SELECT CAST(sum(nij * nij) AS BIGINT) AS s2, "
            "CAST(sum(nij) AS BIGINT) AS ni FROM ct GROUP BY entity_id), "
            "cp AS (SELECT CAST(sum(nij * nij) AS BIGINT) AS s2, "
            "CAST(sum(nij) AS BIGINT) AS mj FROM ct GROUP BY cluster_id), "
            "te AS (SELECT CAST(sum(ni) AS BIGINT) AS nrec, "
            "CAST(sum((ni * (ni - 1)) // 2) AS BIGINT) AS si, "
            "sum(s2::DOUBLE / ni) AS bp FROM ep), "
            "tc AS (SELECT CAST(sum((mj * (mj - 1)) // 2) AS BIGINT) AS sj, "
            "sum(s2::DOUBLE / mj) AS br FROM cp), "
            "tb AS (SELECT CAST(sum((nij * (nij - 1)) // 2) AS BIGINT) "
            "AS sij FROM ct), "
            "fin AS (SELECT nrec, si, sj, sij, "
            "round(bp / nrec * 1000000) / 1000000 AS bcubed_precision, "
            "round(br / nrec * 1000000) / 1000000 AS bcubed_recall, "
            "(si::DOUBLE * sj::DOUBLE) / "
            "(((nrec * (nrec - 1)) // 2)::DOUBLE) AS expv "
            "FROM te, tc, tb) "
            "SELECT nrec AS n_records, si AS sum_pairs_pred, "
            "sj AS sum_pairs_gold, sij AS sum_pairs_both, "
            "CASE WHEN ((si + sj) / 2.0 - expv) = 0 THEN 1.0 "
            "ELSE (sij::DOUBLE - expv) / ((si + sj) / 2.0 - expv) END "
            "AS ari, bcubed_precision, bcubed_recall, "
            "CASE WHEN bcubed_precision + bcubed_recall = 0 THEN 0.0 "
            "ELSE 2 * bcubed_precision * bcubed_recall / "
            "(bcubed_precision + bcubed_recall) END AS bcubed_f1 "
            "FROM fin"
        ),
        "er_golden_records": (
            # all-integer/string survivorship — no float recipe; the
            # partition comes from the same recursive-CTE closure and
            # the member text masses from the same string_agg assembly
            # the er_conversations oracle uses
            f"WITH RECURSIVE {_CC_SQL}, "
            "cv AS (SELECT conv_id, count(*) AS n_turns, "
            "length(string_agg(text, chr(10) ORDER BY turn_idx)) "
            "AS n_chars "
            f"FROM read_parquet('{_SIDE_DIR}/transcripts/*.parquet') "
            "GROUP BY conv_id), "
            "c2 AS (SELECT e.entity_id, c.conv_id, c.n_turns, c.n_chars "
            "FROM cv c JOIN ent e ON e.conv_id = c.conv_id), "
            "base AS (SELECT entity_id, "
            "min(conv_id) AS canonical_conv_id, "
            "count(*) AS n_conversations, "
            "CAST(sum(n_turns) AS BIGINT) AS n_turns, "
            "CAST(sum(n_chars) AS BIGINT) AS n_chars "
            "FROM c2 GROUP BY entity_id), "
            "rep AS (SELECT entity_id, conv_id AS rep_conv_id, "
            "n_chars AS rep_n_chars FROM c2 "
            "QUALIFY row_number() OVER (PARTITION BY entity_id "
            "ORDER BY n_chars DESC, conv_id) = 1) "
            "SELECT b.entity_id, b.canonical_conv_id, b.n_conversations, "
            "b.n_turns, b.n_chars, r.rep_conv_id, r.rep_n_chars "
            "FROM base b JOIN rep r ON r.entity_id = b.entity_id"
        ),
        "er_incremental": (
            # old catalog = min-label closure over old-old edges only
            # (the state the previous full run left behind); candidates
            # are the engine-exported above-threshold (new, old, score)
            # triples — the same evidentiary standard as er_entities
            # (engine-scored edges, independently re-derived closure +
            # argmax + assignment)
            "WITH RECURSIVE conv0 AS (SELECT DISTINCT conv_id FROM "
            f"read_parquet('{_SIDE_DIR}/transcripts/*.parquet') "
            "WHERE conv_id NOT LIKE '%0'), "
            "e0 AS (SELECT src, dst FROM "
            f"read_parquet('{_SIDE_DIR}/er_edges/*.parquet') "
            "WHERE src NOT LIKE '%0' AND dst NOT LIKE '%0'), "
            "sym0 AS (SELECT src AS a, dst AS b FROM e0 UNION "
            "SELECT dst AS a, src AS b FROM e0), "
            "walk0(node, label) AS ("
            "SELECT conv_id, conv_id FROM conv0 "
            "UNION "
            "SELECT s.b, w.label FROM walk0 w JOIN sym0 s ON s.a = w.node "
            "WHERE w.label < s.b), "
            "ent0 AS (SELECT node AS conv_id, min(label) AS entity_id "
            "FROM walk0 GROUP BY node), "
            "cand AS (SELECT new_id, old_id, score FROM "
            f"read_parquet('{_SIDE_DIR}/er_inc_cands/*.parquet')), "
            "best AS (SELECT new_id, old_id FROM cand "
            "QUALIFY row_number() OVER (PARTITION BY new_id "
            "ORDER BY score DESC, old_id) = 1), "
            "nc AS (SELECT DISTINCT conv_id FROM "
            f"read_parquet('{_SIDE_DIR}/transcripts/*.parquet') "
            "WHERE conv_id LIKE '%0') "
            "SELECT n.conv_id, "
            "CASE WHEN b.old_id IS NOT NULL THEN e.entity_id "
            "ELSE n.conv_id END AS entity_id, "
            "coalesce(b.old_id, '') AS matched_conv "
            "FROM nc n LEFT JOIN best b ON b.new_id = n.conv_id "
            "LEFT JOIN ent0 e ON e.conv_id = b.old_id"
        ),
        "er_review_queue": (
            # band membership, uncertainty ordering and the cut all
            # re-derived from the exported engine scores; abs(score-τ)
            # is the identical float expression on both engines
            "SELECT conv_id_left, conv_id_right, score, "
            f"abs(score - {_er_cfg().threshold}) AS uncertainty "
            f"FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet') "
            f"WHERE abs(score - {_er_cfg().threshold}) <= 0.1 "
            "ORDER BY uncertainty, conv_id_left, conv_id_right LIMIT 200"
        ),
        "er_consistency_report": (
            # partition re-derived via the recursive-CTE closure; counts
            # are exact BIGINTs and min/max are order-independent reads
            # of the exported engine scores — bitwise, no rounding
            f"WITH RECURSIVE {_CC_SQL}, "
            "p AS (SELECT conv_id_left, conv_id_right, score FROM "
            f"read_parquet('{_SIDE_DIR}/er_pairs/*.parquet')), "
            "j AS (SELECT el.entity_id AS entity_id, p.score FROM p "
            "JOIN ent el ON el.conv_id = p.conv_id_left "
            "JOIN ent er ON er.conv_id = p.conv_id_right "
            "WHERE el.entity_id = er.entity_id) "
            "SELECT entity_id, count(*) AS n_pairs, "
            f"sum((score >= {_er_cfg().threshold})::INT)::BIGINT AS n_direct, "
            f"(count(*) - sum((score >= {_er_cfg().threshold})::INT))::BIGINT "
            "AS n_forced, "
            "min(score) AS min_score, max(score) AS max_score "
            "FROM j GROUP BY entity_id"
        ),
        "er_summary": (
            # all-int64 counts + one raw int64 quotient — bitwise
            f"WITH RECURSIVE {_CC_SQL}, "
            "sizes AS (SELECT entity_id, count(*) AS size FROM ent "
            "GROUP BY entity_id) "
            "SELECT CAST(sum(size) AS BIGINT) AS n_conversations, "
            "count(*) AS n_entities, "
            "sum((size = 1)::INT)::BIGINT AS n_singletons, "
            "CAST(max(size) AS BIGINT) AS max_cluster_size, "
            "CAST(sum(size) AS BIGINT)::DOUBLE / count(*) "
            "AS mean_cluster_size FROM sizes"
        ),
        "er_match_weights": (
            # Fellegi–Sunter m/u agreement probabilities: all three
            # comparison features recomputed from the raw transcripts
            # (the bitwise er_similarity_verify recipe), labels from
            # gold; counts are exact BIGINTs and the probabilities raw
            # int64 quotients — bitwise parity, no rounding
            "WITH conv AS (SELECT conv_id, "
            "string_agg(text, chr(10) ORDER BY turn_idx) AS text "
            f"FROM read_parquet('{_SIDE_DIR}/transcripts/*.parquet') "
            "GROUP BY conv_id), "
            f"p AS (SELECT * FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet')), "
            "s AS (SELECT p.conv_id_left, p.conv_id_right, "
            "substring(a.text, 1, 128) AS ta, substring(b.text, 1, 128) AS tb, "
            f"{toks.replace('text', 'a.text')} AS ka, "
            f"{toks.replace('text', 'b.text')} AS kb "
            "FROM p JOIN conv a ON a.conv_id = p.conv_id_left "
            "JOIN conv b ON b.conv_id = p.conv_id_right), "
            "f AS (SELECT conv_id_left, conv_id_right, "
            "coalesce(len(list_intersect(ka, kb)) * 1.0 / "
            "nullif(len(ka) + len(kb) - len(list_intersect(ka, kb)), 0), 0.0)"
            " AS jaccard, "
            "CASE WHEN ta = tb THEN 1.0 "
            "ELSE jaro_winkler_similarity(ta, tb) END AS jaro_winkler, "
            "CASE WHEN greatest(length(ta), length(tb)) = 0 THEN 1.0 "
            "ELSE 1.0 - levenshtein(ta, tb)::DOUBLE / "
            "greatest(length(ta), length(tb)) END AS levenshtein FROM s), "
            "g AS (SELECT conv_id, cluster_id "
            f"FROM read_parquet('{_SIDE_DIR}/gold_clusters')), "
            "lab AS (SELECT f.jaccard, f.jaro_winkler, f.levenshtein, "
            "(gl.cluster_id = gr.cluster_id) AS im FROM f "
            "JOIN g gl ON gl.conv_id = f.conv_id_left "
            "JOIN g gr ON gr.conv_id = f.conv_id_right), "
            "cj AS (SELECT sum(im::INT)::BIGINT AS nm, "
            "sum((NOT im)::INT)::BIGINT AS nu, "
            "sum((im AND jaccard >= 0.5)::INT)::BIGINT AS am, "
            "sum((NOT im AND jaccard >= 0.5)::INT)::BIGINT AS au FROM lab), "
            "cw AS (SELECT sum(im::INT)::BIGINT AS nm, "
            "sum((NOT im)::INT)::BIGINT AS nu, "
            "sum((im AND jaro_winkler >= 0.9)::INT)::BIGINT AS am, "
            "sum((NOT im AND jaro_winkler >= 0.9)::INT)::BIGINT AS au "
            "FROM lab), "
            "cl AS (SELECT sum(im::INT)::BIGINT AS nm, "
            "sum((NOT im)::INT)::BIGINT AS nu, "
            "sum((im AND levenshtein >= 0.8)::INT)::BIGINT AS am, "
            "sum((NOT im AND levenshtein >= 0.8)::INT)::BIGINT AS au "
            "FROM lab) "
            "SELECT 'jaccard' AS feature, nm AS n_match, nu AS n_unmatch, "
            "am AS n_agree_match, au AS n_agree_unmatch, "
            "CASE WHEN nm = 0 THEN 0.0 ELSE am / nm END AS m_prob, "
            "CASE WHEN nu = 0 THEN 0.0 ELSE au / nu END AS u_prob FROM cj "
            "UNION ALL SELECT 'jaro_winkler', nm, nu, am, au, "
            "CASE WHEN nm = 0 THEN 0.0 ELSE am / nm END, "
            "CASE WHEN nu = 0 THEN 0.0 ELSE au / nu END FROM cw "
            "UNION ALL SELECT 'levenshtein', nm, nu, am, au, "
            "CASE WHEN nm = 0 THEN 0.0 ELSE am / nm END, "
            "CASE WHEN nu = 0 THEN 0.0 ELSE au / nu END FROM cl"
        ),
        "er_score_calibration": (
            # one float multiply+floor, then pure integer counts — exact
            "WITH g AS (SELECT conv_id, cluster_id "
            f"FROM read_parquet('{_SIDE_DIR}/gold_clusters')) "
            "SELECT floor(score * 50)::BIGINT AS bin, "
            "count(*) AS n_pairs, "
            "sum((gl.cluster_id = gr.cluster_id)::INT)::BIGINT AS n_match "
            f"FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet') p "
            "JOIN g gl ON gl.conv_id = p.conv_id_left "
            "JOIN g gr ON gr.conv_id = p.conv_id_right "
            "GROUP BY bin"
        ),
        "er_threshold_sweep": (
            # integer suffix sums over the calibration bins + single
            # IEEE divisions of exact integers — bitwise on both engines
            "WITH g AS (SELECT conv_id, cluster_id "
            f"FROM read_parquet('{_SIDE_DIR}/gold_clusters')), "
            "lab AS (SELECT floor(score * 50)::BIGINT AS bin, "
            "(gl.cluster_id = gr.cluster_id) AS im "
            f"FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet') p "
            "JOIN g gl ON gl.conv_id = p.conv_id_left "
            "JOIN g gr ON gr.conv_id = p.conv_id_right), "
            "bins AS (SELECT bin, count(*)::BIGINT AS np, "
            "sum(im::INT)::BIGINT AS nm FROM lab GROUP BY bin), "
            "tot AS (SELECT coalesce(sum(nm), 0)::BIGINT AS all_match "
            "FROM bins), "
            "gp AS (SELECT coalesce(sum(n * (n - 1) // 2), 0)::BIGINT "
            "AS gold_pairs FROM (SELECT count(*)::BIGINT AS n FROM g "
            "GROUP BY cluster_id)), "
            "k AS (SELECT range::BIGINT AS t FROM range(0, 50)), "
            "cum AS (SELECT k.t, coalesce(sum(b.np), 0)::BIGINT AS n_pred, "
            "coalesce(sum(b.nm), 0)::BIGINT AS n_tp "
            "FROM k LEFT JOIN bins b ON b.bin >= k.t GROUP BY k.t) "
            "SELECT t AS threshold_bin, n_pred, n_tp, "
            "CASE WHEN n_pred = 0 THEN 0.0 ELSE n_tp / n_pred END "
            "AS precision_t, "
            "CASE WHEN all_match = 0 THEN 0.0 ELSE n_tp / all_match END "
            "AS recall_cand, "
            "CASE WHEN gold_pairs = 0 THEN 0.0 ELSE n_tp / gold_pairs END "
            "AS recall_gold FROM cum, tot, gp"
        ),
        "er_agreement_patterns": (
            # Fellegi–Sunter sufficient statistic: all three comparison
            # features recomputed bitwise from the raw transcripts (the
            # er_similarity_verify recipe), one bit per feature in
            # sorted name order, pure BIGINT counts — bitwise parity
            "WITH conv AS (SELECT conv_id, "
            "string_agg(text, chr(10) ORDER BY turn_idx) AS text "
            f"FROM read_parquet('{_SIDE_DIR}/transcripts/*.parquet') "
            "GROUP BY conv_id), "
            f"p AS (SELECT * FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet')), "
            "s AS (SELECT p.conv_id_left, p.conv_id_right, "
            "substring(a.text, 1, 128) AS ta, substring(b.text, 1, 128) AS tb, "
            f"{toks.replace('text', 'a.text')} AS ka, "
            f"{toks.replace('text', 'b.text')} AS kb "
            "FROM p JOIN conv a ON a.conv_id = p.conv_id_left "
            "JOIN conv b ON b.conv_id = p.conv_id_right), "
            "f AS (SELECT "
            "coalesce(len(list_intersect(ka, kb)) * 1.0 / "
            "nullif(len(ka) + len(kb) - len(list_intersect(ka, kb)), 0), 0.0)"
            " AS jaccard, "
            "CASE WHEN ta = tb THEN 1.0 "
            "ELSE jaro_winkler_similarity(ta, tb) END AS jaro_winkler, "
            "CASE WHEN greatest(length(ta), length(tb)) = 0 THEN 1.0 "
            "ELSE 1.0 - levenshtein(ta, tb)::DOUBLE / "
            "greatest(length(ta), length(tb)) END AS levenshtein FROM s) "
            "SELECT ((jaccard >= 0.5)::INT + 2 * (jaro_winkler >= 0.9)::INT "
            "+ 4 * (levenshtein >= 0.8)::INT)::BIGINT AS pattern, "
            "count(*)::BIGINT AS n_pairs FROM f GROUP BY pattern"
        ),
        "er_fs_scores": (
            # FS log-odds: features recomputed bitwise, log2 weights
            # read back as the exact exported doubles, and the SAME
            # left-associated sum prior+t_jac+t_jw+t_lev as the kernel
            # — bitwise parity, no transcendental evaluated here
            "WITH conv AS (SELECT conv_id, "
            "string_agg(text, chr(10) ORDER BY turn_idx) AS text "
            f"FROM read_parquet('{_SIDE_DIR}/transcripts/*.parquet') "
            "GROUP BY conv_id), "
            f"p AS (SELECT * FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet')), "
            "s AS (SELECT p.conv_id_left, p.conv_id_right, "
            "substring(a.text, 1, 128) AS ta, substring(b.text, 1, 128) AS tb, "
            f"{toks.replace('text', 'a.text')} AS ka, "
            f"{toks.replace('text', 'b.text')} AS kb "
            "FROM p JOIN conv a ON a.conv_id = p.conv_id_left "
            "JOIN conv b ON b.conv_id = p.conv_id_right), "
            "f AS (SELECT conv_id_left, conv_id_right, "
            "coalesce(len(list_intersect(ka, kb)) * 1.0 / "
            "nullif(len(ka) + len(kb) - len(list_intersect(ka, kb)), 0), 0.0)"
            " AS jaccard, "
            "CASE WHEN ta = tb THEN 1.0 "
            "ELSE jaro_winkler_similarity(ta, tb) END AS jaro_winkler, "
            "CASE WHEN greatest(length(ta), length(tb)) = 0 THEN 1.0 "
            "ELSE 1.0 - levenshtein(ta, tb)::DOUBLE / "
            "greatest(length(ta), length(tb)) END AS levenshtein FROM s), "
            "w AS (SELECT "
            "max(CASE WHEN feature = 'jaccard' THEN w_agree END) AS ja, "
            "max(CASE WHEN feature = 'jaccard' THEN w_disagree END) AS jd, "
            "max(CASE WHEN feature = 'jaro_winkler' THEN w_agree END) AS wa, "
            "max(CASE WHEN feature = 'jaro_winkler' THEN w_disagree END) AS wd, "
            "max(CASE WHEN feature = 'levenshtein' THEN w_agree END) AS la, "
            "max(CASE WHEN feature = 'levenshtein' THEN w_disagree END) AS ld, "
            "max(CASE WHEN feature = '_prior' THEN w_agree END) AS pr "
            f"FROM read_parquet('{_SIDE_DIR}/er_fs_weights.parquet')) "
            "SELECT f.conv_id_left, f.conv_id_right, "
            "w.pr + (CASE WHEN f.jaccard >= 0.5 THEN w.ja ELSE w.jd END) "
            "+ (CASE WHEN f.jaro_winkler >= 0.9 THEN w.wa ELSE w.wd END) "
            "+ (CASE WHEN f.levenshtein >= 0.8 THEN w.la ELSE w.ld END) "
            "AS log_odds FROM f, w"
        ),
        "er_threshold_stability": (
            # three min-label closures (recursive CTE, the _CC_SQL
            # pattern) over the exported scores at 0.65/0.70/0.75 +
            # distinct (parent,child) label pairs per adjacent tier —
            # pure integer counts
            "WITH RECURSIVE conv AS (SELECT DISTINCT conv_id "
            f"FROM read_parquet('{_SIDE_DIR}/transcripts/*.parquet')), "
            "p AS (SELECT conv_id_left, conv_id_right, score "
            f"FROM read_parquet('{_SIDE_DIR}/er_pairs/*.parquet')), "
            "sym65 AS (SELECT conv_id_left AS a, conv_id_right AS b FROM p "
            "WHERE score >= 0.65 UNION SELECT conv_id_right, conv_id_left "
            "FROM p WHERE score >= 0.65), "
            "walk65(node, label) AS (SELECT conv_id, conv_id FROM conv "
            "UNION SELECT s.b, w.label FROM walk65 w JOIN sym65 s "
            "ON s.a = w.node WHERE w.label < s.b), "
            "e65 AS (SELECT node, min(label) AS lab FROM walk65 "
            "GROUP BY node), "
            "sym70 AS (SELECT conv_id_left AS a, conv_id_right AS b FROM p "
            "WHERE score >= 0.7 UNION SELECT conv_id_right, conv_id_left "
            "FROM p WHERE score >= 0.7), "
            "walk70(node, label) AS (SELECT conv_id, conv_id FROM conv "
            "UNION SELECT s.b, w.label FROM walk70 w JOIN sym70 s "
            "ON s.a = w.node WHERE w.label < s.b), "
            "e70 AS (SELECT node, min(label) AS lab FROM walk70 "
            "GROUP BY node), "
            "sym75 AS (SELECT conv_id_left AS a, conv_id_right AS b FROM p "
            "WHERE score >= 0.75 UNION SELECT conv_id_right, conv_id_left "
            "FROM p WHERE score >= 0.75), "
            "walk75(node, label) AS (SELECT conv_id, conv_id FROM conv "
            "UNION SELECT s.b, w.label FROM walk75 w JOIN sym75 s "
            "ON s.a = w.node WHERE w.label < s.b), "
            "e75 AS (SELECT node, min(label) AS lab FROM walk75 "
            "GROUP BY node), "
            "m1 AS (SELECT l.lab AS pp, m.lab AS cc FROM e65 l "
            "JOIN e70 m USING (node) GROUP BY 1, 2), "
            "mm AS (SELECT pp FROM m1 GROUP BY pp HAVING count(*) > 1), "
            "s1 AS (SELECT m.lab AS pp, h.lab AS cc FROM e70 m "
            "JOIN e75 h USING (node) GROUP BY 1, 2), "
            "ss AS (SELECT pp FROM s1 GROUP BY pp HAVING count(*) > 1) "
            "SELECT (SELECT count(*) FROM conv)::BIGINT AS n_conversations, "
            "(SELECT count(DISTINCT lab) FROM e65)::BIGINT AS n_entities_lo, "
            "(SELECT count(DISTINCT lab) FROM e70)::BIGINT AS n_entities_mid, "
            "(SELECT count(DISTINCT lab) FROM e75)::BIGINT AS n_entities_hi, "
            "(SELECT count(*) FROM mm)::BIGINT AS n_merge_lo_from_mid, "
            "(SELECT count(*) FROM ss)::BIGINT AS n_split_mid_at_hi"
        ),
        "er_blocking_sweep": blocking_sweep_sql,
        "bench_scenario_counts": (
            "WITH names AS (SELECT split FROM "
            f"read_parquet('{_SIDE_DIR}/bench_split_names.parquet')), "
            "p AS (SELECT split FROM "
            f"read_parquet('{_SIDE_DIR}/bench_splits/*.parquet', "
            "union_by_name=true)) "
            "SELECT n.split, count(p.split)::BIGINT AS n_pairs "
            "FROM names n LEFT JOIN p ON p.split = n.split GROUP BY n.split"
        ),
        "bench_ratio_counts": (
            "WITH p AS (SELECT name, label FROM "
            f"read_parquet('{_SIDE_DIR}/ratio_splits/*.parquet', "
            "union_by_name=true)), "
            "keys AS (SELECT DISTINCT p.name, l.label "
            "FROM p CROSS JOIN (VALUES (0), (1)) AS l(label)) "
            "SELECT k.name, k.label::BIGINT AS label, "
            "count(p.name)::BIGINT AS n_pairs FROM keys k "
            "LEFT JOIN p ON p.name = k.name AND p.label = k.label "
            "GROUP BY k.name, k.label"
        ),
        "dedup_incremental": (
            "WITH cand AS (SELECT * FROM "
            f"read_parquet('{_SIDE_DIR}/minhash_candidates_inc/*.parquet')), "
            f"d AS (SELECT doc_id, {toks} AS tk FROM documents), "
            "j AS (SELECT c.doc_id_left, c.doc_id_right, "
            "len(list_intersect(a.tk, b.tk)) * 1.0 / "
            "nullif(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)), 0)"
            " AS jac FROM cand c "
            "JOIN d a ON a.doc_id = c.doc_id_left "
            "JOIN d b ON b.doc_id = c.doc_id_right), "
            "v AS (SELECT doc_id_left, doc_id_right FROM j WHERE jac >= 0.8), "
            "x AS (SELECT CASE WHEN doc_id_left % 10 = 0 THEN doc_id_left "
            "ELSE doc_id_right END AS doc_id, CASE WHEN doc_id_left % 10 = 0 "
            "THEN doc_id_right ELSE doc_id_left END AS old_id FROM v "
            "WHERE (doc_id_left % 10 = 0) <> (doc_id_right % 10 = 0)), "
            "m AS (SELECT doc_id, min(old_id) AS dup_of FROM x GROUP BY 1) "
            "SELECT n.doc_id, CAST(CASE WHEN m.dup_of IS NULL THEN 0 ELSE 1 "
            "END AS BIGINT) AS is_dup, coalesce(m.dup_of, -1) AS dup_of "
            "FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) n "
            "LEFT JOIN m USING (doc_id)"
        ),
        "join_rows": (
            # row-level inner join (no aggregate): raw payload doubles
            # pass through both engines untouched — exact, no rounding
            "SELECT o_orderkey, o_custkey, o_orderpriority, l_linenumber, "
            "l_quantity, l_extendedprice FROM orders "
            "JOIN lineitem ON o_orderkey = l_orderkey "
            "WHERE l_quantity >= 49"
        ),
        "full_join_counts": (
            # filtered sides: the synth corpus gives every customer an
            # order, so only the filtered pairing leaves unmatched rows
            # on BOTH sides (genuine full-outer coverage)
            "WITH oc AS (SELECT o_custkey AS custkey, count(*) AS n_orders "
            "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1), "
            "ec AS (SELECT user_id AS custkey, count(*) AS n_events "
            "FROM events WHERE event_type = 'purchase' GROUP BY 1) "
            "SELECT coalesce(oc.custkey, ec.custkey) AS custkey, "
            "coalesce(n_orders, 0) AS n_orders, "
            "coalesce(n_events, 0) AS n_events "
            "FROM oc FULL OUTER JOIN ec ON oc.custkey = ec.custkey"
        ),
        "rollup_agg": (
            # dow parity: (epoch_us // 86400000000 + 4) % 7 — expression-
            # identical to the numpy kernel (0=Sunday); rolled-up levels
            # encode as ('ALL', -1) so no NULL crosses the compare
            "WITH e AS (SELECT event_type, "
            "(epoch_us(ts) // 86400000000 + 4) % 7 AS dow FROM events) "
            "SELECT coalesce(event_type, 'ALL') AS event_type, "
            "coalesce(dow, -1) AS dow, count(*) AS n_events "
            "FROM e GROUP BY ROLLUP(event_type, dow)"
        ),
        "vocab_topk": (
            # NON-distinct normalized token stream (ngram_counts recipe) →
            # counts → 1-based rank ids, (n DESC, token ASC) tie-break
            "WITH d AS (SELECT list_filter(string_split(" + norm + ", ' '), "
            "x -> x <> '') AS tk FROM documents), "
            "u AS (SELECT unnest(tk) AS token FROM d), "
            "c AS (SELECT token, count(*) AS n FROM u GROUP BY token) "
            "SELECT token, n, row_number() OVER (ORDER BY n DESC, token) "
            "AS token_id FROM c ORDER BY token_id LIMIT 1000"
        ),
        "json_extract_agg": (
            # same RE2 pattern as the Ray kernel (regexp group 1 == the
            # named group); every output column is an exact integer
            "WITH e AS (SELECT event_type, CAST(regexp_extract(props, "
            "'\"k\": (\\d+)', 1) AS BIGINT) AS k FROM events) "
            "SELECT event_type, sum(k) AS sum_k, min(k) AS min_k, "
            "max(k) AS max_k, count(*) AS n FROM e GROUP BY event_type"
        ),
        "latest_order": (
            "SELECT o_custkey, o_orderkey, o_orderdate FROM (SELECT *, "
            "row_number() OVER (PARTITION BY o_custkey ORDER BY "
            "o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) "
            "WHERE rn = 1"
        ),
        "value_quartiles": (
            # NTILE over raw doubles: values are only ORDERED, never
            # operated on; (value, event_id) tie-break both sides
            "SELECT event_id, event_type, CAST(ntile(4) OVER ("
            "PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) "
            "AS quartile FROM events"
        ),
        "event_gaps": (
            # LAG window; first-event NULL encoded as -1 on both sides
            "SELECT event_id, user_id, coalesce(epoch_us(ts) - "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, "
            "event_id), -1) AS gap_us FROM events"
        ),
        "above_median_orders": (
            # even-group median is (a+b)/2 of the same two doubles in
            # numpy and DuckDB — bitwise identical, raw-value compare
            "SELECT o_orderkey, o_custkey, o_totalprice FROM (SELECT *, "
            "median(o_totalprice) OVER (PARTITION BY o_custkey) AS med "
            "FROM orders) WHERE o_totalprice > med"
        ),
        "corr_by_type": (
            # NOT built-in corr(): the formula below runs left-to-right
            # on double-cast EXACT integer moment sums, matching the Ray
            # kernel bit-for-bit, then the shared round-at-1e6
            "WITH e AS (SELECT event_type, CAST(round(value * 100) AS "
            "BIGINT) AS x, CAST(regexp_extract(props, '\"k\": (\\d+)', 1) "
            "AS BIGINT) AS y FROM events), "
            "s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, "
            "sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx, "
            "sum(y*y) AS syy FROM e GROUP BY event_type) "
            "SELECT event_type, n, round((CAST(n AS DOUBLE) * sxy - "
            "CAST(sx AS DOUBLE) * sy) / sqrt((CAST(n AS DOUBLE) * sxx - "
            "CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - "
            "CAST(sy AS DOUBLE) * sy)) * 1000000) / 1000000 AS corr_vk "
            "FROM s"
        ),
        "global_rank": (
            "SELECT doc_id, n_chars, row_number() OVER (ORDER BY "
            "n_chars DESC, doc_id) AS rn FROM documents"
        ),
        "unpivot_counts": (
            # sparse long form of the pivot: zero cells dropped
            "SELECT user_id, event_type, count(*) AS n FROM events "
            "GROUP BY user_id, event_type"
        ),
        "global_deciles": (
            "SELECT doc_id, n_chars, CAST(ntile(10) OVER (ORDER BY "
            "n_chars DESC, doc_id) AS BIGINT) AS decile FROM documents"
        ),
        "bm25_multi": _bm25_multi_sql(norm),
        "validate_constraints": (
            "SELECT * FROM (SELECT 'fk_orders_customer' AS check_name, "
            "(SELECT count(*) FROM orders o WHERE NOT EXISTS "
            "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) "
            "AS n_violations "
            "UNION ALL SELECT 'notnull_documents_text', "
            "(SELECT count(*) FROM documents WHERE text IS NULL) "
            "UNION ALL SELECT 'range_lineitem_quantity', "
            "(SELECT count(*) FROM lineitem WHERE l_quantity < 1 "
            "OR l_quantity > 50) "
            "UNION ALL SELECT 'unique_events_event_id', "
            "(SELECT count(*) - count(DISTINCT event_id) FROM events)) "
            "ORDER BY check_name"
        ),
        "table_diff": (
            # v2 simulation rules shared verbatim with the Ray kernel
            "WITH v1 AS (SELECT doc_id, md5(text) AS fp FROM documents), "
            "v2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN "
            "md5(text || ' v2') ELSE md5(text) END AS fp FROM documents "
            "WHERE doc_id % 13 <> 0 "
            "UNION ALL SELECT doc_id + 10000000, md5(text) FROM documents "
            "WHERE doc_id % 11 = 0 AND doc_id % 13 <> 0), "
            "j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, "
            "v1.fp AS f1, v2.fp AS f2 FROM v1 FULL OUTER JOIN v2 "
            "ON v1.doc_id = v2.doc_id) "
            "SELECT doc_id, CASE WHEN f1 IS NULL THEN 'added' "
            "WHEN f2 IS NULL THEN 'removed' ELSE 'changed' END AS change "
            "FROM j WHERE f1 IS NULL OR f2 IS NULL OR f1 <> f2"
        ),
        "key_skew_report": (
            # top_key ties break on the VARCHAR form (the engine carries
            # keys as strings in the diagnostic), hence the CASTs
            "SELECT * FROM ("
            "SELECT 'events.event_type' AS key, "
            "(SELECT count(DISTINCT event_type) FROM events) AS n_keys, "
            "(SELECT count(*) FROM events) AS total_rows, "
            "(SELECT count(*) AS c FROM events GROUP BY event_type "
            "ORDER BY c DESC LIMIT 1) AS max_group, "
            "(SELECT event_type FROM events GROUP BY event_type "
            "ORDER BY count(*) DESC, event_type LIMIT 1) AS top_key "
            "UNION ALL SELECT 'events.user_id', "
            "(SELECT count(DISTINCT user_id) FROM events), "
            "(SELECT count(*) FROM events), "
            "(SELECT count(*) AS c FROM events GROUP BY user_id "
            "ORDER BY c DESC LIMIT 1), "
            "(SELECT CAST(user_id AS VARCHAR) FROM events GROUP BY user_id "
            "ORDER BY count(*) DESC, CAST(user_id AS VARCHAR) LIMIT 1) "
            "UNION ALL SELECT 'orders.o_custkey', "
            "(SELECT count(DISTINCT o_custkey) FROM orders), "
            "(SELECT count(*) FROM orders), "
            "(SELECT count(*) AS c FROM orders GROUP BY o_custkey "
            "ORDER BY c DESC LIMIT 1), "
            "(SELECT CAST(o_custkey AS VARCHAR) FROM orders "
            "GROUP BY o_custkey ORDER BY count(*) DESC, "
            "CAST(o_custkey AS VARCHAR) LIMIT 1)) ORDER BY key"
        ),
        "length_histogram": (
            "SELECT (n_chars // 100) * 100 AS bin, count(*) AS n "
            "FROM documents GROUP BY bin"
        ),
        "weighted_sample": (
            # pinned float expression over exact integers (same
            # divide/multiply order as the kernel) — no rounding needed
            "SELECT doc_id, n_chars FROM documents WHERE "
            f"(('0x' || substr(md5({norm}), 1, 13))::BIGINT + 1) "
            "/ 4503599627370497.0 * 20000.0 < n_chars"
        ),
        "upsert_merge": (
            # the merged table must equal the v2 derivation (same rules
            # as the table_diff oracle)
            "WITH v2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN "
            "md5(text || ' v2') ELSE md5(text) END AS fp FROM documents "
            "WHERE doc_id % 13 <> 0 "
            "UNION ALL SELECT doc_id + 10000000, md5(text) FROM documents "
            "WHERE doc_id % 11 = 0 AND doc_id % 13 <> 0) "
            "SELECT doc_id, fp FROM v2"
        ),
        "cooccurrence_pairs": (
            # distinct (cell, user) then canonical u1<u2 pair per cell,
            # counting the shared cells per pair; cells with more than
            # 512 distinct users are excluded — the IDENTICAL hot-cell
            # cap the Ray kernel applies (and counts via report_oversize)
            "WITH c AS (SELECT DISTINCT event_type || '|' || "
            "CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS cell, "
            "user_id FROM events), "
            "ok AS (SELECT cell FROM c GROUP BY cell "
            "HAVING count(*) <= 512) "
            "SELECT a.user_id AS u1, b.user_id AS u2, count(*) AS n "
            "FROM c a JOIN c b ON a.cell = b.cell "
            "AND a.user_id < b.user_id "
            "JOIN ok ON ok.cell = a.cell GROUP BY 1, 2"
        ),
        "table_profile": (
            "SELECT * FROM ("
            "SELECT 'doc_id' AS \"column\", "
            "count(*) FILTER (WHERE doc_id IS NULL) AS n_nulls, "
            "count(DISTINCT doc_id) AS n_distinct, "
            "CAST(min(doc_id) AS VARCHAR) AS min_v, "
            "CAST(max(doc_id) AS VARCHAR) AS max_v FROM documents "
            "UNION ALL SELECT 'lang', "
            "count(*) FILTER (WHERE lang IS NULL), count(DISTINCT lang), "
            "min(lang), max(lang) FROM documents "
            "UNION ALL SELECT 'n_chars', "
            "count(*) FILTER (WHERE n_chars IS NULL), "
            "count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), "
            "CAST(max(n_chars) AS VARCHAR) FROM documents) "
            "ORDER BY \"column\""
        ),
        "group_size_histogram": (
            "SELECT n_events, count(*) AS n_users FROM "
            "(SELECT user_id, count(*) AS n_events FROM events "
            "GROUP BY user_id) GROUP BY n_events"
        ),
        "dedup_minhash_verify": (
            "WITH cand AS (SELECT * FROM "
            f"read_parquet('{_SIDE_DIR}/minhash_candidates/*.parquet')), "
            f"d AS (SELECT doc_id, {toks} AS tk FROM documents), "
            "j AS (SELECT c.doc_id_left, c.doc_id_right, "
            "len(list_intersect(a.tk, b.tk)) * 1.0 / "
            "nullif(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)), 0)"
            " AS jac FROM cand c "
            "JOIN d a ON a.doc_id = c.doc_id_left "
            "JOIN d b ON b.doc_id = c.doc_id_right) "
            "SELECT doc_id_left, doc_id_right, "
            "round(jac * 1000000) / 1000000 AS jaccard "
            "FROM j WHERE jac >= 0.8"
        ),
        "dedup_simhash_verify": (
            # verify-stage recompute: integer hamming over the exported
            # fingerprints — exact parity (no floats involved)
            "WITH cand AS (SELECT * FROM "
            f"read_parquet('{_SIDE_DIR}/simhash/candidates/*.parquet')), "
            "f AS (SELECT doc_id, fp FROM "
            f"read_parquet('{_SIDE_DIR}/simhash/fps/*.parquet')), "
            "j AS (SELECT c.doc_id_left, c.doc_id_right, "
            "bit_count(xor(a.fp, b.fp))::BIGINT AS hamming FROM cand c "
            "JOIN f a ON a.doc_id = c.doc_id_left "
            "JOIN f b ON b.doc_id = c.doc_id_right) "
            "SELECT doc_id_left, doc_id_right, hamming "
            "FROM j WHERE hamming <= 12"
        ),
        "dedup_embedding_verify": (
            # cosine recompute over exported candidates; ::DOUBLE[] casts
            # (DuckDB's list_cosine_similarity over FLOAT[] returns
            # float32 — the ann_topk lesson) + the shared round-at-1e6
            "WITH cand AS (SELECT * FROM "
            f"read_parquet('{_SIDE_DIR}/emb_candidates/*.parquet')), "
            "j AS (SELECT c.vec_id_left, c.vec_id_right, "
            "list_cosine_similarity(a.embedding::DOUBLE[], "
            "b.embedding::DOUBLE[]) AS cos FROM cand c "
            "JOIN embeddings a ON a.vec_id = c.vec_id_left "
            "JOIN embeddings b ON b.vec_id = c.vec_id_right) "
            "SELECT vec_id_left, vec_id_right, "
            "round(cos * 1000000) / 1000000 AS cosine "
            "FROM j WHERE cos >= 0.35"
        ),
        "ann_topk_filtered": (
            # pre-filtered exact search: candidate set is the lang='en'
            # documents (vec_id == doc_id), queries UNFILTERED; same
            # ::DOUBLE[] + round-at-1e6 + (cosine DESC, vec_id) recipe as
            # the other ANN oracles
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM "
            "embeddings WHERE vec_id < 8), "
            "v AS (SELECT e.vec_id, e.embedding FROM embeddings e "
            "JOIN documents d ON e.vec_id = d.doc_id WHERE d.lang = 'en'), "
            "j AS (SELECT q.query_id, v.vec_id, "
            "round(list_cosine_similarity(q.embedding::DOUBLE[], "
            "v.embedding::DOUBLE[]) * 1000000) / 1000000 AS cosine "
            "FROM q, v), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY query_id "
            "ORDER BY cosine DESC, vec_id) AS rn FROM j) "
            "SELECT query_id, vec_id, cosine FROM r WHERE rn <= 10"
        ),
        "dedup_substring": (
            # exact-substring pair detection is FULLY SQL-expressible (the
            # rolling hash is just an implementation of "group by window
            # string"; the byte-compare verify removes its collisions):
            # all 32-char windows per doc, distinct per doc, self-join on
            # the window STRING, count distinct shared windows per pair —
            # char-based substring == the kernel's byte windows (ASCII)
            "WITH w AS (SELECT DISTINCT doc_id, "
            "substring(text, CAST(i AS INT), 32) AS win FROM documents, "
            "unnest(range(1, len(text) - 32 + 2)) AS t(i)), "
            "p AS (SELECT a.doc_id AS doc_id_left, b.doc_id AS "
            "doc_id_right, count(*) AS n FROM w a JOIN w b "
            "ON a.win = b.win AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_id_left, doc_id_right, CAST(n AS BIGINT) "
            "AS n_shared FROM p"
        ),
        "dedup_containment": (
            # containment = full window coverage: shared distinct windows
            # equal the smaller side's distinct window count
            "WITH w AS (SELECT DISTINCT doc_id, "
            "substring(text, CAST(i AS INT), 32) AS win FROM documents, "
            "unnest(range(1, len(text) - 32 + 2)) AS t(i)), "
            "cnt AS (SELECT doc_id, count(*) AS nw FROM w GROUP BY doc_id), "
            "p AS (SELECT a.doc_id AS doc_id_left, b.doc_id AS "
            "doc_id_right, count(*) AS ns FROM w a JOIN w b "
            "ON a.win = b.win AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT p.doc_id_left, p.doc_id_right, "
            "CAST(p.ns AS BIGINT) AS n_shared, "
            "CAST(CASE WHEN p.ns = cl.nw AND p.ns = cr.nw THEN 0 "
            "WHEN p.ns = cl.nw THEN 1 ELSE 2 END AS BIGINT) "
            "AS contained_side FROM p "
            "JOIN cnt cl ON cl.doc_id = p.doc_id_left "
            "JOIN cnt cr ON cr.doc_id = p.doc_id_right "
            "WHERE p.ns = least(cl.nw, cr.nw)"
        ),
        "semdedup": (
            # full prune re-derivation over the exported k-means cells:
            # intra-cell self-join, lower-vec_id priors only, rounded max
            # prior cosine, keep = rounded msim < tau — the exact rule the
            # reduce kernel applies (compare on the ROUNDED value both
            # sides so the grain is shared)
            "WITH a AS (SELECT vec_id, cluster_id FROM "
            f"read_parquet('{_SIDE_DIR}/semdedup_assign/*.parquet')), "
            "e AS (SELECT a.vec_id, a.cluster_id, b.embedding "
            "FROM a JOIN embeddings b USING (vec_id)), "
            "p AS (SELECT i.vec_id, "
            "max(round(list_cosine_similarity(i.embedding::DOUBLE[], "
            "j.embedding::DOUBLE[]) * 1000000) / 1000000) AS msim "
            "FROM e i JOIN e j ON i.cluster_id = j.cluster_id "
            "AND j.vec_id < i.vec_id GROUP BY i.vec_id) "
            "SELECT e.vec_id, e.cluster_id, "
            "CAST(CASE WHEN coalesce(p.msim, -1.0) >= 0.35 THEN 0 ELSE 1 "
            "END AS BIGINT) AS keep, "
            "coalesce(p.msim, -1.0) AS max_prior_sim "
            "FROM e LEFT JOIN p USING (vec_id)"
        ),
        "ann_topk_lsh_verify": (
            "WITH cand AS (SELECT query_id, vec_id FROM "
            f"read_parquet('{_SIDE_DIR}/ann_lsh_candidates/*.parquet')), "
            "j AS (SELECT c.query_id, c.vec_id, "
            "round(list_cosine_similarity(q.embedding::DOUBLE[], "
            "v.embedding::DOUBLE[]) * 1000000) / 1000000 AS cosine "
            "FROM cand c JOIN embeddings q ON q.vec_id = c.query_id "
            "JOIN embeddings v ON v.vec_id = c.vec_id), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY query_id "
            "ORDER BY cosine DESC, vec_id) AS rn FROM j) "
            "SELECT query_id, vec_id, cosine FROM r WHERE rn <= 10"
        ),
        "ann_topk_ivf_verify": (
            "WITH cand AS (SELECT query_id, vec_id FROM "
            f"read_parquet('{_SIDE_DIR}/ann_ivf_candidates/*.parquet')), "
            "j AS (SELECT c.query_id, c.vec_id, "
            "round(list_cosine_similarity(q.embedding::DOUBLE[], "
            "v.embedding::DOUBLE[]) * 1000000) / 1000000 AS cosine "
            "FROM cand c JOIN embeddings q ON q.vec_id = c.query_id "
            "JOIN embeddings v ON v.vec_id = c.vec_id), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY query_id "
            "ORDER BY cosine DESC, vec_id) AS rn FROM j) "
            "SELECT query_id, vec_id, cosine FROM r WHERE rn <= 10"
        ),
        "filter_project": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE lang IN ('en','de') AND n_chars > 120"
        ),
        "groupby_count": (
            "SELECT event_type, count(*) AS n, round(sum(value) * 100) / 100 AS sum_value "
            "FROM events GROUP BY event_type"
        ),
        "distinct": "SELECT DISTINCT lang FROM documents",
        "group_size_filter": (
            "SELECT user_id, count(*) AS n FROM events "
            "GROUP BY user_id HAVING count(*) >= 10"
        ),
        "semi_join": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
        ),
        "anti_join": (
            # NOT EXISTS, not NOT IN: a NULL key on the right would make
            # NOT IN return zero rows (three-valued logic) while the Ray
            # anti-join still emits unmatched lefts
            "SELECT c_custkey, c_name FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_orderstatus = 'F' AND o_custkey = c.c_custkey)"
        ),
        "join_agg": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "round(sum(o_totalprice) * 100) / 100 AS sum_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "topk": (
            "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
            "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15"
        ),
        "union_dedup": (
            "SELECT DISTINCT doc_id, lang FROM documents "
            "WHERE doc_id < 300 OR doc_id >= 200"
        ),
        "assembly": (
            "SELECT user_id, count(*) AS n_events, "
            "string_agg(event_type, '|' ORDER BY ts, event_id) AS event_seq "
            "FROM events GROUP BY user_id"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity) * 100) / 100 AS sum_qty, "
            "round(sum(l_extendedprice) * 100) / 100 AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)) * 100) / 100 AS sum_disc_price, "
            "count(*) AS n "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "concat_cols": (
            "SELECT doc_id, coalesce(lang, '') || ' ' || coalesce(source, '') "
            "AS combined FROM documents"
        ),
        "group_topk": (
            "SELECT user_id, event_id, round(value * 1000000) / 1000000 AS value FROM events "
            "QUALIFY row_number() OVER "
            "(PARTITION BY user_id ORDER BY value DESC, event_id) <= 2"
        ),
        "deterministic_split": (
            "SELECT doc_id, lang FROM documents WHERE doc_id % 10 < 7"
        ),
        "regex_clean": (
            "SELECT doc_id, regexp_replace(text, '[0-9]+', '#', 'g') "
            "AS cleaned FROM documents"
        ),
        "overlap_stats": (
            "SELECT count(DISTINCT user_id) AS n_users, "
            "count(DISTINCT CASE WHEN user_id IN "
            "(SELECT c_custkey FROM customer) THEN user_id END) AS n_overlap "
            "FROM events"
        ),
        "sliding_window_agg": (
            # hopping windows via the time_bucket - j*slide unnest CTE;
            # each event contributes to 60/15 = 4 overlapping windows
            "WITH e AS (SELECT time_bucket(INTERVAL '15 minutes', ts) "
            "- j * INTERVAL '15 minutes' AS window_start, event_type, "
            "value FROM events, unnest(range(0, 4)) AS t(j)) "
            "SELECT window_start, event_type, count(*) AS n, "
            "round(sum(value) * 100) / 100 AS sum_value "
            "FROM e GROUP BY 1, 2"
        ),
        "window_agg": (
            "SELECT date_trunc('hour', ts) AS window_start, event_type, "
            "count(*) AS n, round(sum(value) * 100) / 100 AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "asof_join": (
            # explicit window form of ASOF (not DuckDB's native ASOF JOIN,
            # which picks an UNSPECIFIED row among equal-max-ts views):
            # ties resolve to max(event_id), matching the engine's
            # event_id-stable packed-key sort (ADVICE r3 #4)
            "SELECT event_id, user_id, ts, last_view_ts, last_view_value "
            "FROM (SELECT p.event_id, p.user_id, p.ts, "
            "v.ts AS last_view_ts, v.value AS last_view_value, "
            "row_number() OVER (PARTITION BY p.event_id "
            "ORDER BY v.ts DESC, v.event_id DESC) AS rn "
            "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
            "JOIN (SELECT * FROM events WHERE event_type = 'view') v "
            "ON v.user_id = p.user_id AND v.ts < p.ts) WHERE rn = 1"
        ),
        "range_join": (
            "SELECT p.event_id, p.user_id, p.ts, "
            "count(c.ts) AS n_prior_24h, "
            "round(coalesce(sum(c.value), 0) * 100) / 100 AS sum_value_24h "
            "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
            "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
            "ON c.user_id = p.user_id AND c.ts >= p.ts - INTERVAL 24 HOUR "
            "AND c.ts < p.ts "
            "GROUP BY p.event_id, p.user_id, p.ts"
        ),
        "session_funnel": (
            # the sessionize CTE + three nested earliest-qualifying stage
            # timestamps; stage depends only on event times (ties in ts
            # produce brk=0 on both engines, so session labels agree)
            "WITH g AS (SELECT user_id, ts, event_type, CASE WHEN "
            "lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > "
            "INTERVAL 6 HOUR THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, ts, event_type, sum(brk) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) "
            "AS session_seq FROM g), "
            "base AS (SELECT user_id, session_seq::BIGINT AS session_seq, "
            "min(ts) FILTER (WHERE event_type = 'view') AS vt "
            "FROM s GROUP BY 1, 2), "
            "c AS (SELECT s.user_id, s.session_seq::BIGINT AS session_seq, "
            "min(s.ts) AS ct FROM s JOIN base b ON s.user_id = b.user_id "
            "AND s.session_seq = b.session_seq WHERE s.event_type = "
            "'click' AND b.vt IS NOT NULL AND s.ts > b.vt GROUP BY 1, 2), "
            "p AS (SELECT s.user_id, s.session_seq::BIGINT AS session_seq, "
            "min(s.ts) AS pt FROM s JOIN c ON s.user_id = c.user_id "
            "AND s.session_seq = c.session_seq WHERE s.event_type = "
            "'purchase' AND s.ts > c.ct GROUP BY 1, 2) "
            "SELECT b.user_id, b.session_seq, CAST(CASE WHEN b.vt IS NULL "
            "THEN 0 ELSE 1 END + CASE WHEN c.ct IS NULL THEN 0 ELSE 1 END "
            "+ CASE WHEN p.pt IS NULL THEN 0 ELSE 1 END AS BIGINT) "
            "AS stage FROM base b LEFT JOIN c ON b.user_id = c.user_id "
            "AND b.session_seq = c.session_seq LEFT JOIN p ON "
            "b.user_id = p.user_id AND b.session_seq = p.session_seq"
        ),
        "sessionize": (
            "WITH g AS ("
            "  SELECT user_id, ts, value, CASE WHEN lag(ts) OVER w IS NULL "
            "    OR ts - lag(ts) OVER w > INTERVAL 6 HOUR THEN 1 ELSE 0 END "
            "    AS brk FROM events WINDOW w AS "
            "    (PARTITION BY user_id ORDER BY ts)"
            "), s AS ("
            "  SELECT user_id, ts, value, sum(brk) OVER "
            "    (PARTITION BY user_id ORDER BY ts "
            "     ROWS UNBOUNDED PRECEDING) AS session_seq FROM g"
            ") SELECT user_id, session_seq::BIGINT AS session_seq, "
            "min(ts) AS session_start, max(ts) AS session_end, "
            "count(*)::BIGINT AS n_events, "
            "round(sum(value) * 100) / 100 AS sum_value "
            "FROM s GROUP BY user_id, session_seq"
        ),
        "token_count": (
            "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens "
            "FROM documents"
        ),
        "quality_scores": (
            "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens, "
            f"len(list_filter(string_split(text, ' '), x -> x IN {stop}))::BIGINT "
            "AS n_stopwords FROM documents"
        ),
        "quality_by_lang": (
            "SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars, "
            "max(n_chars) AS max_chars FROM documents GROUP BY lang"
        ),
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id, count(*) AS n_dups "
            "FROM documents GROUP BY text"
        ),
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS e FROM embeddings "
            "WHERE vec_id < 8), "
            "s AS (SELECT q.qid AS query_id, v.vec_id, "
            "round(list_cosine_similarity(q.e, v.embedding::DOUBLE[]) * 1000000) / 1000000 AS cosine "
            "FROM q CROSS JOIN embeddings v) "
            "SELECT query_id, vec_id, cosine FROM s "
            "QUALIFY row_number() OVER "
            "(PARTITION BY query_id ORDER BY cosine DESC, vec_id) <= 10"
        ),
        "mm_payload_sizes": (
            "SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes "
            "FROM documents"
        ),
    }
