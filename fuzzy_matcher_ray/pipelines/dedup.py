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


def minhash_edges(norm, cfg: PipelineConfig, attacher=None):
    """MinHash/LSH pass → exact-Jaccard-verified edges (a, b, jaccard)."""
    band_rows = add_stage(norm.select_columns(["doc_id", "fold_text", "tier"]),
                          MinHasher, cfg)
    pairs = key_pairs(band_rows, ["band", "band_hash"], cfg)
    with_texts = attach_pair_texts(pairs, norm.select_columns(["doc_id", "norm_text"]),
                                   cfg, attacher=attacher)
    return with_texts.map_batches(JaccardVerifier(cfg), batch_format="pyarrow",
                                  batch_size=cfg.batch_size)


def simhash_edges(norm, cfg: PipelineConfig, attacher=None):
    """SimHash block pass: Hamming ≤ d candidates, then exact-Jaccard verify
    at a relaxed threshold (backstop for near-threshold MinHash misses)."""
    rows = add_stage(norm.select_columns(["doc_id", "fold_text", "tier"]),
                     SimHasher, cfg)
    pairs = key_pairs(rows, ["block", "block_val"], cfg,
                      carry_cols=["simhash"],
                      pair_filter=simhash_pair_filter(cfg.simhash_hamming_max))
    pairs = _edges_only(pairs)
    with_texts = attach_pair_texts(pairs, norm.select_columns(["doc_id", "norm_text"]),
                                   cfg, attacher=attacher)
    relaxed = max(0.5, cfg.jaccard_threshold - 0.1)
    return with_texts.map_batches(JaccardVerifier(cfg, relaxed),
                                  batch_format="pyarrow",
                                  batch_size=cfg.batch_size)


def _exclude_known_pairs(pairs, known_edges, broadcast_max: int = 20_000_000):
    """Anti-join pairs against an already-verified edge set on (a, b).

    Broadcast a packed-key set while it fits; fall back to a hash-partitioned
    left_anti join beyond (both sides keyed identically at any scale).
    """
    from fuzzy_matcher_ray.functions.shingle import splitmix64

    def _pack_ab(t: pa.Table) -> np.ndarray:
        a = t["a"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).view(np.uint64)
        return splitmix64(a * np.uint64(0x9E3779B97F4A7C15) ^ b)

    n = known_edges.count()
    if n <= broadcast_max:
        import ray
        keys_parts = [
            _pack_ab(t) for t in known_edges.select_columns(["a", "b"]).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow") if len(t)]
        keys = np.unique(np.concatenate(keys_parts)) if keys_parts else np.empty(0, np.uint64)
        ref = ray.put(keys)

        def _f(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            if len(ks) == 0 or len(t) == 0:
                return t
            k = _pack_ab(t)
            idx = np.clip(np.searchsorted(ks, k), 0, len(ks) - 1)
            return t.filter(pa.array(ks[idx] != k))

        return pairs.map_batches(_f, batch_format="pyarrow")
    from fuzzy_matcher_ray.stages.joins import JOIN_AGG_ARGS, effective_partitions
    return pairs.join(known_edges.select_columns(["a", "b"]), "left_anti",
                      effective_partitions(32), on=("a", "b"),
                      aggregator_ray_remote_args=JOIN_AGG_ARGS)


def substring_edges(norm, cfg: PipelineConfig, exclude_edges=None, attacher=None):
    """Winnowed-fingerprint co-location → seed-extension-verified long-repeat
    edges, with suffix-array verification where seeds can't decide.

    Per pair we keep the Min and Max packed seed (pos_a<<21|pos_b) plus the
    shared-fingerprint count. The verifier extends both seeds; if neither
    reaches min_len and the pair shares >= 3 fingerprints, a suffix-array
    LCP decides exactly (a >= window+winnow-1 repeat always contains >= 1
    selected fingerprint, and a >= min_len=200 repeat contains >= 3, so a
    pair with < 3 shared fps and two failed extensions cannot hide a
    200-char repeat — rejected without SA).
    """
    rows = add_stage(norm.select_columns(["doc_id", "norm_text", "tier"]),
                     Winnower, cfg)

    def _pack(t: pa.Table) -> pa.Array:
        pa_ = t["pos_a"].to_numpy(zero_copy_only=False)
        pb_ = t["pos_b"].to_numpy(zero_copy_only=False)
        valid = (pa_ < (1 << 21)) & (pb_ < (1 << 21))   # docs > 2M chars → SA fallback
        return pa.array(np.where(valid, (pa_ << 21) | pb_, 1 << 62))

    from fuzzy_matcher_ray.stages.candidates import seed_agg_pairs
    pair_rows = key_pairs(rows, ["fp"], cfg, carry_cols=["pos"],
                          derive={"pp": _pack, "pp2": _pack}, dedup=False)
    pairs = seed_agg_pairs(pair_rows)
    if exclude_edges is not None:
        # pairs already confirmed by the exact/MinHash/SimHash passes are
        # edges regardless of this pass's verdict — skip their (expensive)
        # substring verification entirely. Union-find makes the outcome
        # identical; only wasted work is removed.
        pairs = _exclude_known_pairs(pairs, exclude_edges)
    with_texts = attach_pair_texts(pairs,
                                   norm.select_columns(["doc_id", "norm_text"]),
                                   cfg, attacher=attacher)
    return with_texts.map_batches(SubstringVerifier(cfg),
                                  batch_format="pyarrow", batch_size=4096)


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
    from fuzzy_matcher_ray.stages.joins import effective_partitions
    n_blocks = effective_partitions(cfg.join_num_partitions)
    # split into ~CPU-many blocks so every signature stage fans out even when
    # the source is a single parquet file / arrow table (block split, no move)
    norm = ck.stage("normalize",
                    lambda: normalized_docs(docs, cfg).repartition(n_blocks))
    edge_sets = []
    # one broadcast copy of (doc_id → norm_text) shared by every verify pass
    from fuzzy_matcher_ray.stages.joins import BROADCAST_MAX_ROWS, BroadcastAttacher
    attacher = None
    if norm.count() <= BROADCAST_MAX_ROWS:
        attacher = BroadcastAttacher(norm, "doc_id", ["norm_text"])
    if "exact" in passes:
        edge_sets.append(ck.stage("edges_exact", lambda: exact_dup_edges(norm, cfg)))
    if "minhash" in passes:
        edge_sets.append(ck.stage(
            "edges_minhash",
            lambda: _edges_only(minhash_edges(norm, cfg, attacher=attacher))))
    if "simhash" in passes:
        edge_sets.append(ck.stage(
            "edges_simhash",
            lambda: _edges_only(simhash_edges(norm, cfg, attacher=attacher))))
    if "substring" in passes:
        known = edge_sets[0] if edge_sets else None
        for e in edge_sets[1:]:
            known = known.union(e)
        edge_sets.append(ck.stage(
            "edges_substring",
            lambda: _edges_only(substring_edges(norm, cfg, exclude_edges=known,
                                                attacher=attacher))))
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
