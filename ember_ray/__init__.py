"""ember_ray — a Ray-Data-native entity-resolution / record-linkage engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference ER benchmark engine (tshu-w/ember, IJCAI 2022) on idiomatic
Ray Data: every stage is a batch transform over a ``ray.data.Dataset``
(zero-copy Arrow blocks), stateful stages are actor pools, wide steps are
explicit ``groupby`` shuffles with skew handling, and every stage can
checkpoint per-partition Parquet state with lineage manifests.

Primary input shape (per BASELINE.json input_hint): a Parquet table of
multi-turn conversation / agent transcripts with columns
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``.

Pipeline (SURVEY.md §3.4):
    read_parquet → assemble conversations (groupby conv_id, stable turn_idx
    order) → normalize/tokenize → block (token + MinHash-LSH keys, salted)
    → pair-gen (groupby block_key, id_left<id_right) → score (actor pool:
    Jaccard / Jaro-Winkler / Levenshtein / TF-IDF-cosine) → threshold →
    cluster (distributed min-label propagation to transitive closure) →
    pairwise F1 vs gold clusters.

No module in this package calls ``ray.init()`` — the driver / CLI / test
fixture owns the Ray session.
"""

__version__ = "0.1.0"
