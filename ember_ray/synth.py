"""Deterministic synthetic transcript corpus with planted gold clusters.

Mirrors the reference's corpus-with-gold-clusters shape (ali corpus,
``/root/reference/data/ali/README.md:33-42``: records + ``cluster_id``
where same cluster ⇔ same entity) for the transcript input schema.
Generation is fully seeded (analog of ``seed_everything(142)`` at
``/root/reference/scripts/construction/build_ali_dataset.py:14``).

Planted structure:
  * ``n_clusters`` template conversations, each duplicated into a cluster of
    2..``max_cluster_size`` variants with controlled perturbations (token
    drop/swap/replace, whitespace noise, ali-style ``k#:#v#;#…`` attribute
    noise — README.md:40's `pv_pairs` format).
  * per-template distractor near-miss conversations that share ~half the
    topic tokens (analog of the reference's 12-similar-cluster hard
    negatives, ``build_ali_dataset.py:36,160-169``) — own cluster ids.
  * singleton noise conversations.

Output: two Parquet tables under ``out_dir`` — ``transcripts.parquet``
(schema.TRANSCRIPTS, one row per turn) and ``gold_clusters.parquet``
(schema.GOLD_CLUSTERS).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import GOLD_CLUSTERS, TRANSCRIPTS

_SYLLABLES = [
    "ka", "ro", "mi", "ta", "sen", "lor", "vin", "dex", "pal", "qu",
    "zor", "ben", "fi", "gra", "hu", "jes", "kle", "mon", "nor", "ost",
    "pra", "rim", "sol", "tur", "ul", "ver", "wex", "yor", "zan", "bel",
]

ROLES = ["user", "assistant"]
TOOLS = ["search", "calculator", "browser", "python", "lookup", "files"]


def _make_vocab(rng: np.random.Generator, size: int) -> list[str]:
    words = set()
    out = []
    while len(out) < size:
        n = rng.integers(2, 5)
        w = "".join(rng.choice(_SYLLABLES) for _ in range(n))
        if w not in words:
            words.add(w)
            out.append(w)
    return out


GEN_VERSION = 3  # bump when generated content changes (busts the corpus cache)


@dataclass(frozen=True)
class SynthConfig:
    n_clusters: int = 40
    max_cluster_size: int = 5
    distractors_per_cluster: int = 2
    n_singletons: int = 20
    vocab_size: int = 4000
    topic_size: int = 40
    seed: int = 142

    def fingerprint(self) -> str:
        return hashlib.sha256(
            json.dumps({**asdict(self), "gen_version": GEN_VERSION},
                       sort_keys=True).encode()
        ).hexdigest()[:16]


def _gen_template(rng: np.random.Generator, vocab: list[str], cfg: SynthConfig):
    """One template conversation: list of (role, text_tokens, tool)."""
    topic = list(rng.choice(vocab, size=cfg.topic_size, replace=False))
    n_turns = int(rng.integers(4, 11))
    turns = []
    for t in range(n_turns):
        k = int(rng.integers(6, 21))
        n_topic = max(1, int(round(k * 0.8)))
        toks = list(rng.choice(topic, size=n_topic)) + list(
            rng.choice(vocab, size=k - n_topic)
        )
        role = ROLES[t % 2]
        tool = ""
        if role == "assistant" and rng.random() < 0.25:
            tool = str(rng.choice(TOOLS))
        turns.append((role, toks, tool))
    return topic, turns


def _perturb(rng: np.random.Generator, turns, vocab: list[str]):
    """Mild, cluster-preserving perturbation of a template's turns."""
    out = []
    for role, toks, tool in turns:
        t = list(toks)
        # token drop / replace / adjacent swap
        t = [w for w in t if rng.random() > 0.08] or [toks[0]]
        t = [str(rng.choice(vocab)) if rng.random() < 0.04 else w for w in t]
        for i in range(len(t) - 1):
            if rng.random() < 0.05:
                t[i], t[i + 1] = t[i + 1], t[i]
        text = " ".join(t)
        if rng.random() < 0.15:  # ali pv_pairs-style attribute noise
            k1, v1 = rng.choice(vocab), rng.choice(vocab)
            text += f" {k1}#:#{v1}#;#size#:#{int(rng.integers(1, 9))}"
        if rng.random() < 0.1:  # whitespace/punct noise
            text = text.replace(" ", "  ", 1) + "."
        out.append((role, text, tool))
    return out


def _distract(rng: np.random.Generator, topic, turns, vocab: list[str]):
    """Near-miss conversation: ~half the topic tokens swapped for fresh ones."""
    repl = {
        w: str(rng.choice(vocab))
        for w in topic
        if rng.random() < 0.55
    }
    out = []
    for role, toks, tool in turns:
        t = [repl.get(w, w) for w in toks]
        t = [w for w in t if rng.random() > 0.15] or t[:1]
        out.append((role, " ".join(t), tool))
    return out


def _gen_chunk(args) -> tuple[list, list]:
    """One deterministic chunk of the corpus: clusters
    [``cluster_base``, …) + its share of singletons. Seeded by
    ``(seed, chunk_id)`` so output is independent of worker scheduling."""
    cfg_dict, chunk_id, n_clusters, n_singletons, cluster_base, vocab = args
    cfg = SynthConfig(**cfg_dict)
    rng = np.random.default_rng([cfg.seed, chunk_id])

    conv_rows: list[tuple[str, int, str, str, str, int]] = []  # ts as int us
    gold: list[tuple[str, int]] = []
    next_cluster = cluster_base
    next_conv = 0
    base_ts = 1_700_000_000_000_000  # fixed epoch-us origin

    def emit(conv_turns, cluster_id: int):
        nonlocal next_conv
        cid = f"c{chunk_id:05d}_{next_conv:07d}"
        next_conv += 1
        ts = base_ts + int(rng.integers(0, 10**9))
        for idx, (role, text, tool) in enumerate(conv_turns):
            ts += int(rng.integers(1_000_000, 60_000_000))
            conv_rows.append((cid, idx, role, text, tool, ts))
        gold.append((cid, cluster_id))

    for _ in range(n_clusters):
        topic, turns = _gen_template(rng, vocab, cfg)
        size = int(rng.integers(2, cfg.max_cluster_size + 1))
        cluster_id = next_cluster
        next_cluster += 1
        for _ in range(size):
            emit(_perturb(rng, turns, vocab), cluster_id)
        for _ in range(cfg.distractors_per_cluster):
            emit(_distract(rng, topic, turns, vocab), next_cluster)
            next_cluster += 1

    for _ in range(n_singletons):
        _, turns = _gen_template(rng, vocab, cfg)
        emit([(r, " ".join(t), tl) for r, t, tl in turns], next_cluster)
        next_cluster += 1

    return conv_rows, gold


_CHUNK_CLUSTERS = 250


def generate(cfg: SynthConfig) -> tuple[pa.Table, pa.Table]:
    """Build (transcripts, gold_clusters) Arrow tables, fully deterministic.

    Large configs generate in parallel chunks (process pool), each chunk
    seeded by (seed, chunk_id) with a precomputed cluster-id base — the
    result is identical regardless of pool size or scheduling order.
    """
    vocab = _make_vocab(np.random.default_rng(cfg.seed), cfg.vocab_size)

    # partition work into chunks of ≤_CHUNK_CLUSTERS clusters (+ a pro-rata
    # share of singletons), with deterministic cluster-id bases
    n_chunks = max(1, -(-max(cfg.n_clusters, 1) // _CHUNK_CLUSTERS))
    cfg_dict = asdict(cfg)
    jobs = []
    cluster_base = 0
    for i in range(n_chunks):
        nc = cfg.n_clusters // n_chunks + (1 if i < cfg.n_clusters % n_chunks else 0)
        ns = cfg.n_singletons // n_chunks + (
            1 if i < cfg.n_singletons % n_chunks else 0
        )
        jobs.append((cfg_dict, i, nc, ns, cluster_base, vocab))
        cluster_base += nc * (1 + cfg.distractors_per_cluster) + ns

    if n_chunks == 1:
        results = [_gen_chunk(jobs[0])]
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=min(16, n_chunks)) as ex:
            results = list(ex.map(_gen_chunk, jobs))

    conv_rows = [r for rows, _ in results for r in rows]
    gold = [g for _, golds in results for g in golds]

    conv_id, turn_idx, role, text, tool, ts = zip(*conv_rows)
    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
        },
        schema=TRANSCRIPTS,
    )
    g_conv, g_cluster = zip(*gold)
    gold_t = pa.table(
        {
            "conv_id": pa.array(g_conv, pa.string()),
            "cluster_id": pa.array(g_cluster, pa.int64()),
        },
        schema=GOLD_CLUSTERS,
    )
    return transcripts, gold_t


def ensure_corpus(cfg: SynthConfig, root: str = "/tmp/ember_ray_synth") -> str:
    """Write (or reuse) the corpus for ``cfg`` under a fingerprint-keyed dir.

    Returns the directory containing transcripts.parquet + gold_clusters.parquet.
    Shuffles transcript row order deterministically so assembly genuinely has
    to sort by turn_idx (the stable-ordering invariant).
    """
    out = os.path.join(root, cfg.fingerprint())
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    transcripts, gold_t = generate(cfg)
    perm = np.random.default_rng(cfg.seed + 1).permutation(len(transcripts))
    tmp = out + ".tmp"
    os.makedirs(os.path.join(tmp, "transcripts.parquet"), exist_ok=True)
    # many files, not one: read parallelism (and hence every downstream
    # map stage's task count) follows file/block count — a single giant
    # file caps the whole pipeline at a handful of tasks
    n_files = max(1, min(64, transcripts.num_rows // 50_000))
    rows_per = -(-transcripts.num_rows // n_files)
    # take() on a chunked table concatenates the SOURCE chunks per call;
    # past ~3.5M conversations the text column exceeds 2 GiB and the
    # 32-bit string offsets overflow ("offset overflow while
    # concatenating arrays"). Widen string columns to large_string
    # (64-bit offsets) and combine chunks ONCE, gather each file's
    # permutation slice from the single-chunk source, and cast the
    # (< 2 GiB) slice back — byte-identical files, bounded memory.
    orig_schema = transcripts.schema
    wide = pa.schema([
        pa.field(f.name, pa.large_string()) if f.type == pa.string() else f
        for f in orig_schema
    ])
    src = transcripts.cast(wide).combine_chunks()
    del transcripts
    for i in range(n_files):
        idx = pa.array(perm[i * rows_per:(i + 1) * rows_per])
        pq.write_table(
            src.take(idx).cast(orig_schema),
            os.path.join(tmp, "transcripts.parquet", f"part-{i:03d}.parquet"),
        )
    pq.write_table(gold_t, os.path.join(tmp, "gold_clusters.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(cfg.fingerprint())
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.replace(tmp, out)
    return out
