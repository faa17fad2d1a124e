"""Flagship pipeline: web-scale near-duplicate detection + clustering.

The Ray-Data realization of the reference's two-phase roadmap
(``/root/reference/TODO.md:69-74`` — "first-pass approximate index with
n-grams or MinHash … coarse filtering followed by precise matching"):

    read → normalize+gate → ┬ exact content-hash pass ───────────┐
                            ├ MinHash/LSH bands → pairs → verify ┼→ edges
                            ├ SimHash blocks   → pairs (Hamming) ┤
                            └ winnow fps → pairs → SA verify ────┘
    edges → connected components → (doc_id, url, cluster_id)

Every fan-in stage is an explicit hash shuffle with hot-key capping
(stages/candidates.py); every pass streams; nothing materializes the corpus
on the driver. With a Checkpointer, each boxed stage is an immutable Parquet
artifact with a manifest (resume = skip).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fuzzy_matcher_ray.config import PipelineConfig
from fuzzy_matcher_ray.stages.candidates import dedup_pairs, key_pairs
from fuzzy_matcher_ray.stages.cluster import cluster_edges
from fuzzy_matcher_ray.stages.joins import attach_columns
from fuzzy_matcher_ray.stages.minhash_stage import MinHasher, SimHasher, Winnower, add_stage
from fuzzy_matcher_ray.stages.normalize_stage import normalized_docs
from fuzzy_matcher_ray.stages.verify import (
    JaccardVerifier, SubstringVerifier, attach_pair_texts, simhash_pair_filter)
from fuzzy_matcher_ray.state.checkpoint import Checkpointer

_EDGE_SCHEMA = {"a": pa.int64(), "b": pa.int64()}


def _edges_only(ds):
    return ds.select_columns(["a", "b"])


def exact_dup_edges(norm, cfg: PipelineConfig):
    """Exact dedup pre-pass: groupby(text_hash) → equal-text star edges.

    Groups with count>1 are rare relative to the corpus; within each group
    texts are compared for true equality (64-bit hash collisions harmless).
    ≙ terminal-node ID set (fuzzy_types/types.go:38).
    """
    from fuzzy_matcher_ray.stages.normalize_stage import TIER_SKIP
    norm = norm.map_batches(
        lambda t: t.filter(pc.greater(t["tier"], pa.scalar(TIER_SKIP, pa.int8()))),
        batch_format="pyarrow")
    counts = norm.groupby("text_hash").count()
    from fuzzy_matcher_ray.stages.candidates import _count_col
    ccol = _count_col(counts)
    dup_keys = counts.map_batches(
        lambda t: t.filter(pc.greater(t[ccol], pa.scalar(1))),
        batch_format="pyarrow").select_columns(["text_hash"])
    if dup_keys.count() == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    dup_rows = attach_columns(
        norm.select_columns(["doc_id", "text_hash", "norm_text"]),
        dup_keys.map_batches(lambda t: t.append_column("one", pa.nulls(len(t), pa.int8())),
                             batch_format="pyarrow"),
        "text_hash", "text_hash", {"one": "one"}, how="inner",
        num_partitions=cfg.join_num_partitions)

    def _star(group: pa.Table) -> pa.Table:
        # within a hash group, link ids of *identical* texts (collision-safe)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        texts = group["norm_text"].to_pylist()
        order = np.argsort(ids)
        by_text: dict[str, int] = {}
        a_out, b_out = [], []
        for i in order:
            t = texts[i]
            root = by_text.setdefault(t, int(ids[i]))
            if root != int(ids[i]):
                a_out.append(root)
                b_out.append(int(ids[i]))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64())})

    return dup_rows.groupby("text_hash").map_groups(_star, batch_format="pyarrow")


def minhash_edges(norm, cfg: PipelineConfig):
    """MinHash/LSH pass → exact-Jaccard-verified edges (a, b, jaccard)."""
    band_rows = add_stage(norm.select_columns(["doc_id", "fold_text", "tier"]),
                          MinHasher, cfg)
    pairs = key_pairs(band_rows, ["band", "band_hash"], cfg)
    with_texts = attach_pair_texts(pairs, norm.select_columns(["doc_id", "norm_text"]), cfg)
    return with_texts.map_batches(JaccardVerifier(cfg), batch_format="pyarrow",
                                  batch_size=cfg.batch_size)


def simhash_edges(norm, cfg: PipelineConfig):
    """SimHash block pass: Hamming ≤ d candidates, then exact-Jaccard verify
    at a relaxed threshold (backstop for near-threshold MinHash misses)."""
    rows = add_stage(norm.select_columns(["doc_id", "fold_text", "tier"]),
                     SimHasher, cfg)
    pairs = key_pairs(rows, ["block", "block_val"], cfg,
                      carry_cols=["simhash"],
                      pair_filter=simhash_pair_filter(cfg.simhash_hamming_max))
    pairs = _edges_only(pairs)
    with_texts = attach_pair_texts(pairs, norm.select_columns(["doc_id", "norm_text"]), cfg)
    relaxed = max(0.5, cfg.jaccard_threshold - 0.1)
    return with_texts.map_batches(JaccardVerifier(cfg, relaxed),
                                  batch_format="pyarrow",
                                  batch_size=cfg.batch_size)


def substring_edges(norm, cfg: PipelineConfig):
    """Winnowed-fingerprint → suffix-array verified long-repeat edges."""
    rows = add_stage(norm.select_columns(["doc_id", "norm_text", "tier"]),
                     Winnower, cfg)
    pairs = key_pairs(rows, ["fp"], cfg)
    with_texts = attach_pair_texts(pairs, norm.select_columns(["doc_id", "norm_text"]), cfg)
    return with_texts.map_batches(SubstringVerifier(cfg), batch_format="pyarrow",
                                  batch_size=256)


def find_duplicates(docs, cfg: PipelineConfig | None = None,
                    checkpointer: Checkpointer | None = None,
                    passes: tuple = ("exact", "minhash", "simhash", "substring"),
                    cluster_strategy: str = "auto"):
    """docs (doc_id, url, text, ...) → (doc_id, cluster_id [, url]).

    The full flagship. Returns a Dataset of one row per input doc.
    """
    cfg = cfg or PipelineConfig()
    if docs.count() == 0:
        import ray.data as rd
        empty = {"doc_id": pa.array([], pa.int64()),
                 "cluster_id": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string())}
        return rd.from_arrow(pa.table(empty))
    ck = checkpointer or Checkpointer("/tmp/fmr-ck-disabled", cfg.config_hash(),
                                      enabled=False)
    norm = ck.stage("normalize", lambda: normalized_docs(docs, cfg))
    edge_sets = []
    if "exact" in passes:
        edge_sets.append(ck.stage("edges_exact", lambda: exact_dup_edges(norm, cfg)))
    if "minhash" in passes:
        edge_sets.append(ck.stage(
            "edges_minhash", lambda: _edges_only(minhash_edges(norm, cfg))))
    if "simhash" in passes:
        edge_sets.append(ck.stage(
            "edges_simhash", lambda: _edges_only(simhash_edges(norm, cfg))))
    if "substring" in passes:
        edge_sets.append(ck.stage(
            "edges_substring", lambda: _edges_only(substring_edges(norm, cfg))))
    edges = edge_sets[0]
    for e in edge_sets[1:]:
        edges = edges.union(e)
    edges = ck.stage("edges_all", lambda: dedup_pairs(edges))
    clusters = ck.stage(
        "clusters",
        lambda: cluster_edges(edges, norm.select_columns(["doc_id"]), cfg,
                              strategy=cluster_strategy))
    if "url" in docs.schema().names:
        clusters = attach_columns(clusters, docs.select_columns(["doc_id", "url"]),
                                  "doc_id", "doc_id", {"url": "url"}, how="left",
                                  num_partitions=cfg.join_num_partitions)
    return clusters
