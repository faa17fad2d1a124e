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
from fuzzy_matcher_ray.stages.minhash_stage import (
    Signatures, Winnower, add_stage, band_key_rows, simhash_key_rows)
from fuzzy_matcher_ray.stages.normalize_stage import normalized_docs
from fuzzy_matcher_ray.stages.verify import (
    JaccardVerifier, SubstringVerifier, attach_pair_texts, simhash_pair_filter)
from fuzzy_matcher_ray.state.checkpoint import Checkpointer

def _edges_only(ds):
    return ds.select_columns(["a", "b"])


def exact_dup_edges(norm, cfg: PipelineConfig):
    """Exact dedup pre-pass: same 128-bit content key ⇒ duplicate edges.

    ≙ terminal-node ID set (fuzzy_types/types.go:38). Runs through the same
    skew-aware pair machinery as the LSH passes (key = the two independent
    content hashes; collision ~2^-128 so no text comparison is needed);
    exact groups larger than max_band_group emit star+chain edges.
    """
    from ray.data.aggregate import Min

    from fuzzy_matcher_ray.stages.joins import JOIN_AGG_ARGS, effective_partitions
    from fuzzy_matcher_ray.stages.normalize_stage import TIER_SKIP

    rows = norm.map_batches(
        lambda t: pa.table({
            "text_hash": t["text_hash"], "text_hash2": t["text_hash2"],
            "doc_id": t["doc_id"],
        }).filter(pc.greater(t["tier"], pa.scalar(TIER_SKIP, pa.int8()))),
        batch_format="pyarrow").materialize()
    from fuzzy_matcher_ray.stages.candidates import DRIVER_EXPLODE_MAX_ROWS
    if rows.count() <= DRIVER_EXPLODE_MAX_ROWS:
        # driver fast path: one collect, numpy segment min-rep star edges
        import ray.data as rd
        t = pa.concat_tables(list(rows.iter_batches(batch_size=1 << 20,
                                                    batch_format="pyarrow")))
        h1 = t["text_hash"].to_numpy(zero_copy_only=False)
        h2 = t["text_hash2"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h2, h1))
        h1, h2, ids = h1[order], h2[order], ids[order]
        brk = np.empty(len(ids), dtype=bool)
        if len(ids) == 0:
            return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                           "b": pa.array([], pa.int64())}))
        brk[0] = True
        brk[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        rep = ids[np.nonzero(brk)[0]][np.cumsum(brk) - 1]
        keep = ids != rep
        return rd.from_arrow(pa.table({"a": pa.array(rep[keep]),
                                       "b": pa.array(ids[keep])}))
    # star edges via min-rep: one aggregate + one hash join on the full
    # 128-bit key, zero pair explosion (exact mega-groups cost O(n), not
    # O(n^2) — the skew story needs no cap here)
    reps = rows.groupby(["text_hash", "text_hash2"]).aggregate(
        Min("doc_id", alias_name="rep"))
    with_rep = rows.join(reps, "inner",
                         effective_partitions(cfg.join_num_partitions),
                         on=("text_hash", "text_hash2"),
                         aggregator_ray_remote_args=JOIN_AGG_ARGS)

    def _edges(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["doc_id"], t["rep"])
        t = t.filter(keep)
        return pa.table({"a": t["rep"], "b": t["doc_id"]})

    return with_rep.map_batches(_edges, batch_format="pyarrow")


def signature_table(norm, cfg: PipelineConfig):
    """One shingle pass → compact per-doc signatures (bands + simhash).

    The MinHash and SimHash passes both explode THIS ~140 B/doc table for
    their candidate keys; the corpus text is never re-hashed per pass
    (round-1 verdict item 1: redundant shingle passes were the top
    memory-bandwidth cost).
    """
    return add_stage(norm.select_columns(["doc_id", "fold_text", "tier"]),
                     Signatures, cfg)


def _verified_jaccard(pairs, norm, cfg: PipelineConfig, attacher,
                      threshold: float | None = None, sets_ref=None):
    """Exact-Jaccard verification. Preference order: the precomputed
    corpus shingle-set artifact (zero per-batch shingling), the shared text
    broadcast (per-batch chunked recompute), a hash join attaching texts."""
    if sets_ref is not None:
        ver = JaccardVerifier(cfg, threshold, sets_ref=sets_ref)
        src = pairs
    elif attacher is not None:
        ver = JaccardVerifier(cfg, threshold, text_ref=attacher.ref)
        src = pairs
    else:
        ver = JaccardVerifier(cfg, threshold)
        src = attach_pair_texts(pairs, norm.select_columns(["doc_id", "norm_text"]),
                                cfg)
    return src.map_batches(ver, batch_format="pyarrow",
                           batch_size=cfg.verify_batch_size)


def minhash_edges(norm, cfg: PipelineConfig, attacher=None, sigs=None,
                  sets_ref=None):
    """MinHash/LSH pass → exact-Jaccard-verified edges (a, b, jaccard).

    With ``cfg.verify_budget_per_doc`` set, pairs keep their band-agreement
    multiplicity (``dedup=False``) and each doc verifies only its
    top-budget pairs ranked by band-hit count — the ComputeScore/MaxHeap
    best-first budget (utils.go:54-68) bounding verify cost on adversarial
    near-threshold corpora."""
    if sigs is None:
        sigs = signature_table(norm, cfg)
    budget = cfg.verify_budget_per_doc
    pairs = key_pairs(band_key_rows(sigs, cfg), ["band", "band_hash"], cfg,
                      dedup=budget is None)
    if budget is not None:
        from fuzzy_matcher_ray.stages.candidates import budget_pairs, count_pairs
        pairs = budget_pairs(count_pairs(pairs), budget)
    return _verified_jaccard(pairs, norm, cfg, attacher, sets_ref=sets_ref)


def simhash_edges(norm, cfg: PipelineConfig, attacher=None, sigs=None,
                  sets_ref=None):
    """SimHash block pass: Hamming ≤ d candidates, then exact-Jaccard verify
    at a relaxed threshold (backstop for near-threshold MinHash misses)."""
    if sigs is None:
        sigs = signature_table(norm, cfg)
    pairs = key_pairs(simhash_key_rows(sigs, cfg), ["block", "block_val"], cfg,
                      carry_cols=["simhash"],
                      pair_filter=simhash_pair_filter(cfg.simhash_hamming_max))
    pairs = _edges_only(pairs)
    relaxed = max(0.5, cfg.jaccard_threshold - 0.1)
    return _verified_jaccard(pairs, norm, cfg, attacher, relaxed,
                             sets_ref=sets_ref)


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


def substring_edges(norm, cfg: PipelineConfig, attacher=None, exclude_edges=None):
    """Winnowed-fingerprint co-location → exact long-repeat verification.

    Candidate pairs are docs sharing any winnowed window fingerprint
    (complete for repeats >= window + winnow - 1 chars). Verification
    (stages/verify.py SubstringVerifier) intersects stride-1 probe-gram
    hashes and extends at occurrence pairs — exact for the >= min_len
    predicate, with a suffix-array fallback only past a tried-pairs budget
    (pathologically repetitive docs).
    """
    rows = add_stage(norm.select_columns(["doc_id", "norm_text", "tier"]),
                     Winnower, cfg)

    def _pack_pp(t: pa.Table) -> pa.Array:
        # pack the shared-fingerprint seed positions (21 bits each) so ONE
        # consistent (pos_a, pos_b) tuple survives the per-pair Min dedup;
        # out-of-range positions (docs > 2M chars) become null → verifier
        # falls back to the probe-gram intersection path
        pa_ = t["pos_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        pb_ = t["pos_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (pa_ >= 0) & (pb_ >= 0) & (pa_ < (1 << 21)) & (pb_ < (1 << 21))
        packed = (pa_ << 21) | pb_
        arr = pa.array(packed)
        if not ok.all():
            arr = pc.if_else(pa.array(ok), arr, pa.scalar(None, pa.int64()))
        return arr

    pairs = key_pairs(rows.select_columns(["fp", "doc_id", "pos"]), ["fp"], cfg,
                      carry_cols=["pos"], derive={"pp": _pack_pp})
    if exclude_edges is not None:
        # pairs already confirmed by the exact/MinHash/SimHash passes are
        # edges regardless of this pass's verdict — skip their (expensive)
        # substring verification entirely. Union-find makes the outcome
        # identical; only wasted work is removed.
        pairs = _exclude_known_pairs(pairs, exclude_edges)
    if attacher is not None:
        return pairs.map_batches(SubstringVerifier(cfg, text_ref=attacher.ref),
                                 batch_format="pyarrow", batch_size=4096)
    with_texts = attach_pair_texts(pairs,
                                   norm.select_columns(["doc_id", "norm_text"]),
                                   cfg)
    return with_texts.map_batches(SubstringVerifier(cfg),
                                  batch_format="pyarrow", batch_size=4096)


def find_duplicates(docs, cfg: PipelineConfig | None = None,
                    checkpointer: Checkpointer | None = None,
                    passes: tuple = ("exact", "minhash", "simhash", "substring"),
                    cluster_strategy: str = "auto", now=None):
    """docs (doc_id, url, text, ...) → (doc_id, cluster_id [, url]).

    The full flagship. Returns a Dataset of one row per input doc.
    With ``cfg.ttl_mode`` the expiry invariant is enforced (every row must
    carry a non-null valid_until — ≙ Build error on zero expiry,
    fuzzy_matcher_core.go:85-95) and, when ``now`` is given, expired rows
    are dropped before any hashing (search-time auto-clean,
    fuzzy_matcher.go:29-32).
    """
    cfg = cfg or PipelineConfig()
    if cfg.ttl_mode:
        from fuzzy_matcher_ray.state.tombstones import filter_expired, validate_ttl
        docs = validate_ttl(docs) if now is None else \
            filter_expired(docs, now, ttl_mode=True)
    # emptiness probe via limit(1): executes at most one task, unlike a
    # count() which would run the full upstream pipeline before the real run
    if docs.limit(1).count() == 0:
        import ray.data as rd
        empty = {"doc_id": pa.array([], pa.int64()),
                 "cluster_id": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string())}
        return rd.from_arrow(pa.table(empty))
    ck = checkpointer or Checkpointer("/tmp/fmr-ck-disabled", cfg.config_hash(),
                                      enabled=False)
    from fuzzy_matcher_ray.stages.joins import partitions_for
    # Size block count AND every downstream shuffle/join to the DATA, capped
    # by CPUs: at 100 TB bytes/16 MB dwarfs any cluster so this is always the
    # CPU cap; on small inputs it stops per-task fixed costs and concurrent
    # allocation contention from dominating (measured: the 92 MB bench corpus
    # runs 2x faster 8-wide than 32-wide on a 32-cpu box).
    # docs.size_bytes() comes from parquet metadata / in-memory blocks — it
    # never executes the pipeline.
    try:
        src_bytes = docs.size_bytes()
    except Exception:
        src_bytes = None
    import dataclasses as _dc
    cfg = _dc.replace(cfg, join_num_partitions=partitions_for(
        cfg.join_num_partitions, src_bytes))
    n_blocks = cfg.join_num_partitions
    norm = ck.stage("normalize",
                    lambda: normalized_docs(docs, cfg).repartition(n_blocks))
    # one broadcast copy of (doc_id → norm_text) shared by every verify pass
    from fuzzy_matcher_ray.stages.joins import BROADCAST_MAX_ROWS, BroadcastAttacher
    attacher = None
    if norm.count() <= BROADCAST_MAX_ROWS:
        attacher = BroadcastAttacher(norm, "doc_id", ["norm_text"])
    # ONE signature stage (single shingle pass) feeds both LSH passes
    sigs = None
    sets_ref = None
    if "minhash" in passes or "simhash" in passes:
        sigs = ck.stage("signatures", lambda: signature_table(norm, cfg))
        # corpus shingle-set artifact: the Jaccard verifies of both passes
        # intersect zero-copy against ONE plasma object instead of
        # re-shingling every batch's distinct docs (size-gated; None ⇒
        # verifiers fall back to the text broadcast / join paths). Off by
        # default — see config.use_shingle_set_artifact for the measured
        # trade-off. Skipped when every consumer pass resumes from
        # checkpoint.
        needs_verify = any(p in passes and not ck.has(f"edges_{p}")
                           for p in ("minhash", "simhash")) if ck.enabled \
            else True
        if needs_verify and cfg.use_shingle_set_artifact:
            from fuzzy_matcher_ray.stages.verify import build_shingle_sets
            sets_ref = build_shingle_sets(norm, cfg)
    builders = {
        "exact": lambda: exact_dup_edges(norm, cfg),
        "minhash": lambda: _edges_only(
            minhash_edges(norm, cfg, attacher=attacher, sigs=sigs,
                          sets_ref=sets_ref)),
        "simhash": lambda: _edges_only(
            simhash_edges(norm, cfg, attacher=attacher, sigs=sigs,
                          sets_ref=sets_ref)),
        "substring": lambda: _edges_only(
            substring_edges(norm, cfg, attacher=attacher)),
    }
    # the four passes are independent until the edge union — build them on
    # parallel driver threads so their internal barriers (counts, sorts,
    # collects) overlap instead of serializing end-to-end. With checkpointing
    # disabled the per-pass edge datasets stay LAZY: the verify stages of all
    # passes then execute inside ONE streaming execution at the edges_all
    # fan-in (each separate Dataset execution costs ~0.5-1 s of fixed
    # scheduling overhead — the Amdahl term that caps small-corpus scaling).
    from concurrent.futures import ThreadPoolExecutor
    wanted = [p for p in ("exact", "minhash", "simhash", "substring")
              if p in passes]
    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    with ThreadPoolExecutor(max_workers=len(wanted)) as pool:
        futs = {p: pool.submit(
            lambda p=p: ck.stage(f"edges_{p}", builders[p],
                                 materialize_if_disabled=False,
                                 empty_schema=edge_schema))
                for p in wanted}
        edge_sets = [futs[p].result() for p in wanted]
    edges = edge_sets[0]
    for e in edge_sets[1:]:
        edges = edges.union(e)
    edges = ck.stage("edges_all", lambda: dedup_pairs(edges),
                     empty_schema=edge_schema)
    clusters = ck.stage(
        "clusters",
        lambda: cluster_edges(edges, norm.select_columns(["doc_id"]), cfg,
                              strategy=cluster_strategy))
    if "url" in docs.schema().names:
        clusters = attach_columns(clusters, docs.select_columns(["doc_id", "url"]),
                                  "doc_id", "doc_id", {"url": "url"}, how="left",
                                  num_partitions=cfg.join_num_partitions)
    return clusters


def jaccard_allpairs_clusters(docs, cfg: PipelineConfig | None = None,
                              threshold: float | None = None):
    """EXACT all-pairs Jaccard clustering via the inverted shingle index.

    The verification baseline the LSH passes are measured against — no
    banding, no hot-group caps, no misses. Vernica-style all-pairs
    similarity join: distinct ``(shingle, doc_id)`` rows group by shingle to
    emit co-occurrence pairs; pair multiplicity (``count_pairs``) IS the
    intersection size; set sizes attach by join; exact Jaccard thresholds
    the edges; connected components label every doc.

    Cost is output-bound — Σ over shingles of C(group, 2) — so a corpus
    where many docs share a shingle explodes quadratically by definition of
    the problem (use the LSH passes at scale). SQL-expressible end-to-end,
    hence DuckDB-oracle-checked in the driver contract
    (``dedup_jaccard_brute``), unlike the approximate passes.
    """
    from dataclasses import replace

    from fuzzy_matcher_ray.functions.normalize import normalize_array
    from fuzzy_matcher_ray.functions.shingle import shingle_batch, unique_per_doc
    from fuzzy_matcher_ray.stages.candidates import count_pairs, key_pairs
    from fuzzy_matcher_ray.stages.cluster import cluster_edges
    from fuzzy_matcher_ray.stages.joins import attach_columns

    cfg = cfg or PipelineConfig()
    thr = cfg.jaccard_threshold if threshold is None else threshold

    def _rows(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        hashes, counts = shingle_batch(norm, cfg.shingle_k, cfg.seed)
        uh, uc = unique_per_doc(hashes, counts)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # int64 view of the uint64 hashes: grouping only needs the bits,
        # and values past int64-max break Arrow conversion in the
        # distributed groupby branches
        return pa.table({"sh": pa.array(uh.view(np.int64)),
                         "doc_id": pa.array(np.repeat(ids, uc))})

    import ray.data as rd
    if docs.limit(1).count() == 0:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "cluster_id": pa.array([], pa.int64())}))
    # two consumers (pair explode + size groupby) — pin blocks so the
    # normalize+shingle pass runs once, not once per consumer
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        _rows, batch_format="pyarrow").materialize()
    if rows.count() == 0:
        # no doc long enough to shingle — every doc is its own cluster
        no_edges = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                           "b": pa.array([], pa.int64())}))
        return cluster_edges(no_edges, docs.select_columns(["doc_id"]), cfg)
    # exactness requires every within-group pair: lift the skew cap (the
    # star+chain shortcut would silently drop cross-pairs of hot shingles)
    nocap = replace(cfg, max_band_group=1 << 30)
    counted = count_pairs(key_pairs(rows, ["sh"], nocap, dedup=False))
    from fuzzy_matcher_ray.stages.candidates import (DRIVER_EXPLODE_MAX_ROWS,
                                                     _collect_driver_table)
    if rows.count() <= DRIVER_EXPLODE_MAX_ROWS:
        # per-doc set sizes via one driver bincount over the slim
        # materialized doc_id column — skips a full Ray hash groupby
        t = _collect_driver_table(rows, ["doc_id"])
        ids = t["doc_id"].to_numpy(zero_copy_only=False) if t is not None \
            else np.array([], dtype=np.int64)
        uniq, cnt = np.unique(ids, return_counts=True)
        sizes = rd.from_arrow(pa.table({
            "doc_id": pa.array(uniq.astype("int64")),
            "nsh": pa.array(cnt.astype("int64"))}))
    else:
        sizes = rows.groupby("doc_id").count()

        def _csize(t: pa.Table) -> pa.Table:
            ccol = next(c for c in t.schema.names if c != "doc_id")
            return pa.table({"doc_id": t["doc_id"],
                             "nsh": pc.cast(t[ccol], pa.int64())})

        sizes = sizes.map_batches(_csize, batch_format="pyarrow")
    withs = attach_columns(counted, sizes, "a", "doc_id", {"nsh": "na"})
    withs = attach_columns(withs, sizes, "b", "doc_id", {"nsh": "nb"})

    def _thresh(t: pa.Table) -> pa.Table:
        inter = pc.cast(t["hits"], pa.float64())
        union = pc.cast(pc.subtract(pc.add(t["na"], t["nb"]), t["hits"]),
                        pa.float64())
        jac = pc.divide(inter, union)
        return t.filter(pc.greater_equal(jac, pa.scalar(thr))) \
            .select(["a", "b"])

    edges = withs.map_batches(_thresh, batch_format="pyarrow")
    return cluster_edges(edges, docs.select_columns(["doc_id"]), cfg)
