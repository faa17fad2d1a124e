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

import threading

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
        parts = list(rows.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"))
        if not parts:
            # an all-skip-tier corpus yields ZERO batches — concat_tables
            # requires at least one
            return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                           "b": pa.array([], pa.int64())}))
        t = pa.concat_tables(parts)
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
        Min("doc_id", alias_name="rep")).materialize()
    P = effective_partitions(cfg.join_num_partitions)
    if reps.count() < 100 * P:
        # Ray 2.49: hash-aggregate outputs carry SCHEMA-LESS empty blocks
        # for key-less partitions, which break join key resolution
        # (ArrowInvalid "no match for FieldRef text_hash"). Same guard as
        # stages/joins.attach_columns; reps is slim (24 B/key) and already
        # needs one execution for the join, so the materialize+count is
        # nearly free and the repartition only fires in the sparse regime.
        reps = reps.repartition(2)
    with_rep = rows.join(reps, "inner", P,
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


def substring_edges(norm, cfg: PipelineConfig, attacher=None,
                    exclude_edges=None, ck: Checkpointer | None = None):
    """Winnowed-fingerprint co-location → exact long-repeat verification.

    Candidate pairs are docs sharing any winnowed window fingerprint
    (complete for repeats >= window + winnow - 1 chars). Verification
    (stages/verify.py SubstringVerifier) intersects stride-1 probe-gram
    hashes and extends at occurrence pairs — exact for the >= min_len
    predicate, with a suffix-array fallback only past a tried-pairs budget
    (pathologically repetitive docs).

    With a Checkpointer the fingerprint rows persist as the ``winnow_rows``
    artifact — ``incremental_update`` probes it so an increment never
    re-winnows the prior corpus.
    """
    def _rows():
        return add_stage(norm.select_columns(["doc_id", "norm_text", "tier"]),
                         Winnower, cfg)

    rows = ck.stage("winnow_rows", _rows) if ck is not None and ck.enabled \
        else _rows()

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
            substring_edges(norm, cfg, attacher=attacher, ck=ck)),
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


# ---------------------------------------------------------------------------
# Incremental corpus update (≙ InsertEntries, fuzzy_matcher.go:21-27)
# ---------------------------------------------------------------------------

def _load_stage(prior_root: str, name: str, expect_hash: str | None = None):
    """Read a prior run's checkpoint artifact; error clearly if absent."""
    import json
    import os

    import ray.data as rd
    data_dir = os.path.join(prior_root, name, "data")
    manifest = os.path.join(prior_root, name, "_MANIFEST.json")
    if not (os.path.isdir(data_dir) and os.path.isfile(manifest)):
        raise FileNotFoundError(
            f"incremental_update: prior run at {prior_root!r} has no "
            f"completed '{name}' stage (run find_duplicates with a "
            "Checkpointer first)")
    with open(manifest) as f:
        m = json.load(f)
    if expect_hash is not None and m.get("config_hash") != expect_hash:
        raise ValueError(
            f"incremental_update: stage '{name}' was built under config "
            f"hash {m.get('config_hash')!r}, but 'normalize' under "
            f"{expect_hash!r} — the prior checkpoint mixes runs")
    return rd.read_parquet(data_dir), m.get("config_hash")


def _semi_join_keys(rows, keys_ds, key_cols, cfg: PipelineConfig):
    """rows whose ``key_cols`` combo appears in ``keys_ds``.

    Broadcast sorted-array membership while the increment's distinct key
    set fits (``BROADCAST_KEYS_MAX``); hash-partitioned semi join beyond —
    the prior corpus side streams through a filter either way and never
    explodes into pairs for buckets the increment doesn't touch.
    """
    from fuzzy_matcher_ray.stages.candidates import (
        BROADCAST_KEYS_MAX, _collect_combined_keys, _membership_filter)
    if keys_ds.count() <= BROADCAST_KEYS_MAX:
        arr = _collect_combined_keys(keys_ds, key_cols)
        return _membership_filter(rows, key_cols, arr)
    from fuzzy_matcher_ray.stages.joins import (JOIN_AGG_ARGS,
                                                effective_partitions)
    row_schema = {f.name: f.type for f in rows.schema().base_schema}

    def _cast(t: pa.Table) -> pa.Table:
        return pa.table({c: t[c].cast(row_schema[c])
                         if t.schema.field(c).type != row_schema[c]
                         else t[c] for c in key_cols})

    # repartition: hash-aggregate outputs (keys_ds is a groupby) carry
    # schema-less empty blocks that break the join's key resolution
    return rows.join(keys_ds.map_batches(_cast, batch_format="pyarrow")
                     .repartition(effective_partitions(
                         cfg.join_num_partitions)),
                     "left_semi",
                     effective_partitions(cfg.join_num_partitions),
                     on=tuple(key_cols),
                     aggregator_ray_remote_args=JOIN_AGG_ARGS)


# one hash-join aggregator gang at a time across the fold's parallel
# builder threads — see the CONCURRENCY CONTRACT in _semi_join_rows
_FALLBACK_JOIN_LOCK = threading.Lock()

# pin the fold's prior-signature union in the object store (shared by the
# minhash AND simhash semi-joins) only while it stays under this budget;
# larger chains re-read the checkpoint parquet per pass instead — see
# incremental_update
SIGS_PIN_MAX_BYTES = 2 << 30


def _semi_join_rows(rows_prior, rows_inc, key_cols, cfg: PipelineConfig):
    """Prior rows whose ``key_cols`` combo appears among the INCREMENT's
    key rows.

    The increment is the small side by definition: while its row count is
    within the broadcast budget, its distinct combined keys come from ONE
    driver pass (``np.unique`` over streamed batches) and the prior side
    streams through a broadcast membership filter — zero Ray shuffles.
    The distinct-keys hash groupby that a shuffle semi-join needs costs
    ~5-8 s of fixed overhead per execution on one node regardless of size
    (and ``_semi_join_keys`` must execute it twice: gate + collect), which
    at bench scale made the fold slower than a full re-run. Beyond the
    budget the groupby + hash semi-join path takes over — that is the
    multi-node shape, where the fixed cost parallelizes.

    CONCURRENCY CONTRACT: the fold's four pass builders run on parallel
    driver threads. A hash join gang-schedules its aggregator actors per
    execution, and two-plus concurrent gangs on a small cluster starve
    each other (measured: permanent deadlock at ``num_cpus=4`` with the
    broadcast budget forced to 0). So the join fallback executes EAGERLY
    here, under a module lock — one aggregator gang alive at a time; the
    result is the pruned residue (small by construction), and everything
    downstream of it is join-free and stays lazy + fully concurrent.
    """
    from fuzzy_matcher_ray.stages.candidates import (
        BROADCAST_KEYS_MAX, _collect_combined_keys, _membership_filter)
    if rows_inc.count() <= BROADCAST_KEYS_MAX:
        arr = _collect_combined_keys(rows_inc, key_cols)
        return _membership_filter(rows_prior, key_cols, arr)
    keys_inc = rows_inc.groupby(key_cols).count().select_columns(key_cols)
    with _FALLBACK_JOIN_LOCK:
        return _semi_join_keys(rows_prior, keys_inc, key_cols,
                               cfg).materialize()


def _tag_new(ds, flag: int):
    def _f(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_new", pa.array(np.full(len(t), flag, np.int8)))
    return ds.map_batches(_f, batch_format="pyarrow")


def _touches_new(t: pa.Table) -> pa.Table:
    return t.filter(pc.or_(pc.equal(t["is_new_a"], pa.scalar(1)),
                           pc.equal(t["is_new_b"], pa.scalar(1))))


def _increment_schemas(cfg: PipelineConfig):
    """Pinned Arrow schemas for an EMPTY increment's checkpoint artifacts
    (a zero-row shard must still write schema-ful stages so a later fold
    can union it with the rest of the chain)."""
    norm = pa.schema([("doc_id", pa.int64()), ("norm_text", pa.string()),
                      ("fold_text", pa.string()), ("n_norm", pa.int64()),
                      ("text_hash", pa.int64()), ("text_hash2", pa.int64()),
                      ("tier", pa.int8())])
    sig = pa.schema([("doc_id", pa.int64()),
                     ("bands", pa.list_(pa.int64(), cfg.bands)),
                     ("simhash", pa.int64())])
    win = pa.schema([("fp", pa.int64()), ("doc_id", pa.int64()),
                     ("pos", pa.int64())])
    return norm, sig, win


def incremental_update(prior_root: str | list[str], new_docs,
                       cfg: PipelineConfig | None = None,
                       passes: tuple = ("exact", "minhash", "simhash",
                                        "substring"),
                       cluster_strategy: str = "auto",
                       checkpointer: Checkpointer | None = None):
    """Cluster a NEW shard against a prior ``find_duplicates`` run without
    re-scanning the prior corpus — the web-scale InsertEntries
    (``fuzzy_matcher.go:21-27``: the reference mutates a live trie; here the
    prior run's immutable checkpoint artifacts are the index).

    Reads the prior run's artifacts (normalize / signatures / winnow_rows /
    clusters); normalizes and signs ONLY the increment; semi-joins the prior
    key rows against the increment's key set so buckets the increment never
    touches never explode into pairs; keeps only pairs with ≥1 new doc
    (``is_new`` carried through the pair machinery); verifies those pairs;
    and re-labels with union-find over prior-cluster star edges + the new
    edges. Signatures are deterministic per doc, so the result is
    BYTE-IDENTICAL to a full re-run over prior ∪ new (same edge components
    ⇒ same min-id labels) — asserted by tests/test_incremental.py.

    Returns (doc_id, cluster_id) for every doc in prior ∪ new. Requires
    disjoint doc_id spaces (checked) and the same ``cfg`` AND pass set as
    the prior run for full-rerun byte-parity. Folding a WIDER pass set
    over a narrower prior root still works (missing artifacts re-derive
    from the normalize artifact) but is deliberately weaker: only pairs
    touching a new doc are verified, so prior-internal edges stay per the
    prior run's own pass set — asserted in
    tests/test_incremental.py::test_incremental_resigns_pre_lsh_checkpoint;
    ``verify_budget_per_doc`` is rejected (its per-doc ranking depends on
    the global candidate set, which an increment by design does not see).
    Hot-group caveat: parity also assumes no key bucket exceeds
    ``cfg.max_band_group`` — above the cap ``key_pairs`` emits star+chain
    topology whose center shifts when increment ids interleave a prior
    bucket, so near-threshold pairs inside such a bucket can verify
    differently than a full rerun would. Raise ``max_band_group`` (as the
    exact/brute paths do) if byte-parity matters on corpora with
    boilerplate-heavy hot buckets.

    ``prior_root`` may be a LIST of shard roots (a fold chain, oldest
    first): per-shard normalize/signatures/winnow_rows artifacts union into
    the prior index, while ``clusters`` — the current labels for every doc
    folded so far — come from the LAST root only. With ``checkpointer``
    the increment's own artifacts (normalize/signatures/winnow_rows) and
    the merged ``clusters`` persist under its root, making the output a
    valid next link of the chain — ``dedup_sharded`` builds web-scale runs
    out of exactly this step.
    """
    import ray
    import ray.data as rd

    cfg = cfg or PipelineConfig()
    if cfg.verify_budget_per_doc is not None:
        raise ValueError("incremental_update: verify_budget_per_doc breaks "
                         "full-rerun parity; run with budget=None")
    roots = [prior_root] if isinstance(prior_root, str) else list(prior_root)
    if not roots:
        raise ValueError("incremental_update: no prior roots")
    loaded = []                       # [(root, normalize_ds, config_hash)]
    for r in roots:
        n, h = _load_stage(r, "normalize")
        loaded.append((r, n, h))
    chash = loaded[-1][2]
    norm_A = loaded[0][1]
    for _, n, _ in loaded[1:]:
        norm_A = norm_A.union(n)
    clusters_A, _ = _load_stage(roots[-1], "clusters", chash)

    ck = checkpointer if (checkpointer is not None
                          and checkpointer.enabled) else None
    norm_schema, sig_schema, win_schema = _increment_schemas(cfg)
    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    if new_docs.limit(1).count() == 0:
        out = clusters_A.select_columns(["doc_id", "cluster_id"])
        if ck is not None:
            # keep the chain uniform: an empty shard still writes schema-ful
            # (zero-row) artifacts plus the carried-forward labels
            import ray.data as _rd
            for name, sch in (("normalize", norm_schema),
                              ("signatures", sig_schema),
                              ("winnow_rows", win_schema)):
                ck.stage(name, lambda sch=sch: _rd.from_arrow(
                    sch.empty_table()), empty_schema=sch)
            return ck.stage("clusters", lambda: out)
        return out

    from fuzzy_matcher_ray.stages.joins import (BROADCAST_MAX_ROWS,
                                                BroadcastAttacher,
                                                partitions_for)
    import dataclasses as _dc
    try:
        src_bytes = (new_docs.size_bytes() or 0) + (norm_A.size_bytes() or 0)
    except Exception:
        src_bytes = None
    cfg = _dc.replace(cfg, join_num_partitions=partitions_for(
        cfg.join_num_partitions, src_bytes))

    norm_B = (ck.stage("normalize",
                       lambda: normalized_docs(new_docs, cfg),
                       empty_schema=norm_schema)
              if ck is not None
              else normalized_docs(new_docs, cfg).materialize())

    # --- disjoint-id guard: one streaming filter over the slim prior ids
    # against the broadcast increment ids (the increment is the small side
    # by definition; at shard sizes past driver memory, skip via the
    # caller's own id discipline and the check degrades to the join paths
    # simply producing garbage — hence the hard error here while it fits)
    b_ids = np.unique(np.concatenate(
        [t["doc_id"].to_numpy(zero_copy_only=False)
         for t in norm_B.select_columns(["doc_id"])
         .iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
        or [np.empty(0, np.int64)]))
    ids_ref = ray.put(b_ids)

    def _overlap(t: pa.Table) -> pa.Table:
        ks = ray.get(ids_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(ks, ids), 0, max(len(ks) - 1, 0))
        n = int((ks[idx] == ids).sum()) if len(ks) else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    # --- prelude barriers in PARALLEL: the overlap guard, the shared text
    # broadcast and the increment's signatures are independent Dataset
    # executions; run serially their fixed scheduling costs (~0.5-1 s each
    # on one node) stack up per fold — the dominant Amdahl term of a cold
    # dedup_sharded chain. Same driver-thread fan-in as find_duplicates.
    from concurrent.futures import ThreadPoolExecutor

    def _overlap_guard():
        n_overlap = sum(
            t["n"].to_pylist()[0]
            for t in clusters_A.select_columns(["doc_id"])
            .map_batches(_overlap, batch_format="pyarrow")
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        if n_overlap:
            raise ValueError(
                f"incremental_update: {n_overlap} doc_ids of the "
                "increment already exist in the prior corpus")

    def _norm_all_build():
        # shared text broadcast for the verify stages (A ∪ B, slim columns)
        na = norm_A.select_columns(["doc_id", "norm_text"]).union(
            norm_B.select_columns(["doc_id", "norm_text"])).materialize()
        att = (BroadcastAttacher(na, "doc_id", ["norm_text"])
               if na.count() <= BROADCAST_MAX_ROWS else None)
        return na, att

    def _sigs_B_build():
        if "minhash" not in passes and "simhash" not in passes:
            return None
        return (ck.stage("signatures", lambda: signature_table(norm_B, cfg),
                         empty_schema=sig_schema)
                if ck is not None
                else signature_table(norm_B, cfg).materialize())

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_overlap = pool.submit(_overlap_guard)
        f_norm_all = pool.submit(_norm_all_build)
        f_sigs = pool.submit(_sigs_B_build)
        norm_all, attacher = f_norm_all.result()
        sigs_B = f_sigs.result()
        f_overlap.result()

    from fuzzy_matcher_ray.stages.normalize_stage import TIER_SKIP

    def _hash_rows(norm):
        return norm.map_batches(
            lambda t: pa.table({
                "text_hash": t["text_hash"], "text_hash2": t["text_hash2"],
                "doc_id": t["doc_id"]}).filter(
                    pc.greater(t["tier"], pa.scalar(TIER_SKIP, pa.int8()))),
            batch_format="pyarrow")

    def _exact_inc():
        from ray.data.aggregate import Min

        from fuzzy_matcher_ray.stages.joins import (JOIN_AGG_ARGS,
                                                    effective_partitions)
        # B-internal exact groups
        intra = exact_dup_edges(norm_B, cfg)
        # A→B links: only prior rows whose 128-bit key the increment carries
        rows_B = _hash_rows(norm_B).materialize()
        rows_A = _semi_join_rows(_hash_rows(norm_A), rows_B,
                                 ["text_hash", "text_hash2"], cfg) \
            .materialize()
        n_A = rows_A.count()
        if n_A == 0:
            # no shared 128-bit key across the corpora — a zero-block
            # dataset has no schema and would break the join below
            return intra
        from fuzzy_matcher_ray.stages.candidates import BROADCAST_KEYS_MAX
        if n_A <= BROADCAST_KEYS_MAX:
            # driver fast path: rows_A is the semi-joined residue (only
            # prior rows sharing a 128-bit key with the increment) — small
            # by construction. Min-rep per key comes from one driver
            # lexsort; linking B is a streaming EXACT lookup on the full
            # (text_hash, text_hash2) pair via a structured-dtype
            # searchsorted (the lossy 64-bit _combined_key mix is fine for
            # membership, where a collision only admits an extra row the
            # real-key grouping re-drops, but NOT for rep links, where it
            # would silently fuse distinct clusters). Replaces a groupby +
            # repartition + hash join — three fixed-cost shuffles that
            # dwarf a small fold on one node; past the budget the shuffle
            # path below is the multi-node shape.
            _KEY_DT = np.dtype([("h1", "<i8"), ("h2", "<i8")])

            def _keys_of(t: pa.Table) -> np.ndarray:
                k = np.empty(len(t), dtype=_KEY_DT)
                k["h1"] = t["text_hash"].to_numpy(zero_copy_only=False)
                k["h2"] = t["text_hash2"].to_numpy(zero_copy_only=False)
                return k

            t_A = pa.concat_tables(
                [b for b in rows_A.iter_batches(batch_size=1 << 20,
                                                batch_format="pyarrow")
                 if len(b)])
            k_A = _keys_of(t_A)
            ids_A = t_A["doc_id"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids_A, k_A["h2"], k_A["h1"]))
            k_A, ids_A = k_A[order], ids_A[order]
            first = np.concatenate(([True], k_A[1:] != k_A[:-1]))
            rep_ref = ray.put((k_A[first], ids_A[first]))

            def _link(t: pa.Table) -> pa.Table:
                ks, reps = ray.get(rep_ref)
                q = _keys_of(t)
                idx = np.clip(np.searchsorted(ks, q), 0, len(ks) - 1)
                hit = ks[idx] == q
                return pa.table({
                    "a": pa.array(reps[idx[hit]]),
                    "b": pa.array(t["doc_id"].to_numpy(
                        zero_copy_only=False)[hit])})

            return intra.union(rows_B.map_batches(_link,
                                                  batch_format="pyarrow"))
        # repartition: the hash-aggregate emits schema-less EMPTY blocks
        # for key-less partitions, which poison a downstream hash join
        # ("no match for key field on right side"); a repartition rebuilds
        # uniform blocks with the real schema
        reps_A = rows_A.groupby(["text_hash", "text_hash2"]).aggregate(
            Min("doc_id", alias_name="rep")).repartition(
                effective_partitions(cfg.join_num_partitions))
        linked = rows_B.join(reps_A, "inner",
                             effective_partitions(cfg.join_num_partitions),
                             on=("text_hash", "text_hash2"),
                             aggregator_ray_remote_args=JOIN_AGG_ARGS)
        cross = linked.map_batches(
            lambda t: pa.table({"a": t["rep"], "b": t["doc_id"]}),
            batch_format="pyarrow")
        return intra.union(cross)

    sigs_A = None
    if "minhash" in passes or "simhash" in passes:
        for r, n, h in loaded:
            try:
                s, _ = _load_stage(r, "signatures", h)
            except FileNotFoundError:
                # root built without the LSH passes: re-sign from its
                # normalize artifact (correct, just not incremental)
                s = signature_table(n, cfg)
            sigs_A = s if sigs_A is None else sigs_A.union(s)
        # both LSH passes scan this prior-signature union (band keys AND
        # simhash keys). While it fits a bounded object-store budget, pin
        # it ONCE so the two semi-joins share a single execution instead
        # of re-reading the whole chain's artifacts per pass — a per-fold
        # fixed cost that stacks on cold chains. Past the budget the lazy
        # re-read streams: at open-web scale a second pruned parquet read
        # beats pinning the corpus signatures in the object store.
        if (sigs_A is not None and "minhash" in passes
                and "simhash" in passes):
            try:
                sig_bytes = sigs_A.size_bytes() or 0
            except Exception:
                sig_bytes = None
            if sig_bytes is not None and sig_bytes <= SIGS_PIN_MAX_BYTES:
                sigs_A = sigs_A.materialize()

    def _lsh_inc(key_rows_fn, key_cols, carry, pair_filter):
        # materialize the increment's key rows: _semi_join_rows consumes
        # them twice (count gate + key collect) — lazy they would re-derive
        # from the signature scan on each consumption
        rows_B = key_rows_fn(sigs_B, cfg).materialize()
        rows_A = _semi_join_rows(key_rows_fn(sigs_A, cfg), rows_B,
                                 key_cols, cfg)
        rows = _tag_new(rows_A, 0).union(_tag_new(rows_B, 1))
        return key_pairs(rows, key_cols, cfg,
                         carry_cols=carry + ["is_new"],
                         pair_filter=pair_filter)

    def _minhash_inc():
        pairs = _lsh_inc(band_key_rows, ["band", "band_hash"], [],
                         _touches_new)
        return _edges_only(_verified_jaccard(pairs, norm_all, cfg, attacher))

    def _simhash_inc():
        ham = simhash_pair_filter(cfg.simhash_hamming_max)
        pairs = _lsh_inc(simhash_key_rows, ["block", "block_val"],
                         ["simhash"],
                         lambda t: ham(_touches_new(t)))
        relaxed = max(0.5, cfg.jaccard_threshold - 0.1)
        return _edges_only(
            _verified_jaccard(pairs, norm_all, cfg, attacher, relaxed))

    def _substring_inc():
        rows_A_all = None
        for r, n, h in loaded:
            try:
                w, _ = _load_stage(r, "winnow_rows", h)
            except FileNotFoundError:
                # pre-winnow_rows checkpoint: rebuild from that root's
                # normalize artifact (correct, just not incremental)
                w = add_stage(n.select_columns(["doc_id", "norm_text",
                                                "tier"]), Winnower, cfg)
            rows_A_all = w if rows_A_all is None else rows_A_all.union(w)

        def _win_B():
            return add_stage(
                norm_B.select_columns(["doc_id", "norm_text", "tier"]),
                Winnower, cfg)

        rows_B = (ck.stage("winnow_rows", _win_B, empty_schema=win_schema)
                  if ck is not None else _win_B().materialize())
        rows_A = _semi_join_rows(
            rows_A_all.select_columns(["fp", "doc_id", "pos"]), rows_B,
            ["fp"], cfg)
        rows = _tag_new(rows_A, 0).union(
            _tag_new(rows_B.select_columns(["fp", "doc_id", "pos"]), 1))

        def _pack_pp(t: pa.Table) -> pa.Array:
            pa_ = t["pos_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            pb_ = t["pos_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            ok = (pa_ >= 0) & (pb_ >= 0) & (pa_ < (1 << 21)) & (pb_ < (1 << 21))
            packed = (pa_ << 21) | pb_
            arr = pa.array(packed)
            if not ok.all():
                arr = pc.if_else(pa.array(ok), arr, pa.scalar(None, pa.int64()))
            return arr

        pairs = key_pairs(rows, ["fp"], cfg,
                          carry_cols=["pos", "is_new"],
                          pair_filter=_touches_new, derive={"pp": _pack_pp})
        if attacher is not None:
            ver = pairs.map_batches(SubstringVerifier(cfg, text_ref=attacher.ref),
                                    batch_format="pyarrow", batch_size=4096)
        else:
            with_texts = attach_pair_texts(pairs, norm_all, cfg)
            ver = with_texts.map_batches(SubstringVerifier(cfg),
                                         batch_format="pyarrow",
                                         batch_size=4096)
        return _edges_only(ver)

    builders = {"exact": _exact_inc, "minhash": _minhash_inc,
                "simhash": _simhash_inc, "substring": _substring_inc}
    # the four fold passes are independent until the edge union — build on
    # parallel driver threads so their internal barriers (semi-join counts,
    # key collects, winnow writes) overlap instead of serializing; the lazy
    # edge datasets then fan into ONE streaming execution at edges_all
    wanted = [p for p in ("exact", "minhash", "simhash", "substring")
              if p in passes]
    new_edges = None
    if wanted:
        with ThreadPoolExecutor(max_workers=len(wanted)) as pool:
            futs = {p: pool.submit(builders[p]) for p in wanted}
            edge_sets = [futs[p].result() for p in wanted]
        for e in edge_sets:
            new_edges = e if new_edges is None else new_edges.union(e)

    # touched-only relabel pays ~3 extra fixed-cost Dataset executions per
    # fold (endpoint collect, touched-cid scan, the split) to avoid the
    # corpus-wide star-edge shuffle + union-find; below the gate the full
    # relabel is cheaper on one node (probe at 40k/3 shards: 1.87× vs
    # 2.17× chain ratio), above it the O(total)-per-fold relabel is the
    # dominant chain term. FMR_INC_TOUCHED_MIN_PRIOR=0 forces the
    # touched-only twin for parity tests.
    import os as _os
    min_prior = int(_os.environ.get("FMR_INC_TOUCHED_MIN_PRIOR",
                                    INC_TOUCHED_MIN_PRIOR))
    touched_mode = clusters_A.count() >= min_prior

    if new_edges is not None:
        raw_edges = new_edges
        new_edges = (ck.stage("edges_all", lambda: dedup_pairs(raw_edges),
                              empty_schema=edge_schema)
                     if ck is not None else
                     # in touched mode _incremental_labels consumes the
                     # edges twice (endpoint collect + the label union);
                     # without a checkpoint backing them with parquet, a
                     # lazy edge dataset would re-run the whole pair
                     # machinery per consumption
                     (dedup_pairs(raw_edges).materialize() if touched_mode
                      else dedup_pairs(raw_edges)))

    ids_B = norm_B.select_columns(["doc_id"])

    def _label():
        return _incremental_labels(clusters_A, new_edges, ids_B, cfg,
                                   cluster_strategy, touched_mode)

    return ck.stage("clusters", _label) if ck is not None else _label()


# New-edge endpoint budget for the touched-component relabel: past it the
# increment has rewired a major fraction of the corpus and the full relabel
# is the honest cost anyway. Read at call time (not import) so parity tests
# can force the fallback with FMR_INC_TOUCHED_MAX=0 in-process.
INC_TOUCHED_MAX = 4_000_000
# Prior-corpus row gate below which the full relabel wins on fixed costs
# (see the probe numbers at the call site); FMR_INC_TOUCHED_MIN_PRIOR=0
# forces the touched-only twin in-process.
INC_TOUCHED_MIN_PRIOR = 2_000_000


def _incremental_labels(clusters_A, new_edges, ids_B, cfg,
                        strategy: str, touched_mode: bool = True):
    """Label prior ∪ increment WITHOUT relabeling untouched components.

    The naive fold relabels the whole corpus-so-far every link (star edges
    for every prior component + union-find + a corpus-wide label join) —
    O(total) per fold, O(k²) across a k-shard chain, the dominant chain
    term at 10^12 docs. But a component no new edge touches keeps its exact
    membership, hence its exact min-doc_id label. So: collect the new
    edges' endpoint set (O(increment dups), driver-budgeted), find the
    prior cluster ids those endpoints belong to (one streaming
    broadcast-membership scan — no shuffle), pass every other prior row's
    label THROUGH untouched, and run star-edges + union-find + the label
    join over only the touched components and the increment. Byte-identical
    to the full relabel (asserted by test_incremental parity plus a
    dedicated fallback-vs-fast test); past the endpoint budget — or below
    the prior-corpus size gate, where the full relabel's single fused
    execution beats the touched path's extra fixed costs — it runs the
    full relabel.
    """
    import os

    import ray

    base = clusters_A.select_columns(["doc_id", "cluster_id"])

    def _full_relabel():
        # prior components enter as star edges (cluster_id IS the
        # component's min doc_id, so (cluster_id, doc_id) reconnects them
        # exactly)
        prior_star = base.map_batches(
            lambda t: pa.table(
                {"a": t["cluster_id"], "b": t["doc_id"]}).filter(
                    pc.not_equal(t["cluster_id"], t["doc_id"])),
            batch_format="pyarrow")
        all_edges = prior_star if new_edges is None \
            else new_edges.union(prior_star)
        all_ids = base.select_columns(["doc_id"]).union(ids_B)
        return cluster_edges(all_edges, all_ids, cfg, strategy=strategy)

    if not touched_mode:
        return _full_relabel()

    budget = int(os.environ.get("FMR_INC_TOUCHED_MAX", INC_TOUCHED_MAX))
    en = np.empty(0, np.int64)
    if new_edges is not None:
        chunks, total = [], 0
        over = False
        for t in new_edges.iter_batches(batch_size=1 << 20,
                                        batch_format="pyarrow"):
            u = np.unique(np.concatenate(
                [t["a"].to_numpy(zero_copy_only=False),
                 t["b"].to_numpy(zero_copy_only=False)]))
            chunks.append(u)
            total += len(u)
            if total > budget:
                over = True
                break
        if not over and chunks:
            en = np.unique(np.concatenate(chunks))
            over = len(en) > budget
        if over:
            return _full_relabel()

    if not len(en):
        # no new edges at all: prior labels pass through verbatim and
        # every increment doc is its own singleton — no join, no
        # union-find, and no empty-edge dataset to trip the join schema
        singles = ids_B.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "cluster_id": t["doc_id"]}),
            batch_format="pyarrow")
        return base.union(singles)

    en_ref = ray.put(en)

    def _member(col, ks: np.ndarray) -> np.ndarray:
        ids = col.to_numpy(zero_copy_only=False)
        if not len(ks):
            return np.zeros(len(ids), bool)
        idx = np.clip(np.searchsorted(ks, ids), 0, len(ks) - 1)
        return ks[idx] == ids

    def _touched_cids(t: pa.Table) -> pa.Table:
        hit = _member(t["doc_id"], ray.get(en_ref))
        cids = t["cluster_id"].to_numpy(zero_copy_only=False)[hit]
        return pa.table({"cluster_id": pa.array(np.unique(cids),
                                                pa.int64())})

    tc_parts = [b["cluster_id"].to_numpy(zero_copy_only=False)
                for b in base.map_batches(_touched_cids,
                                          batch_format="pyarrow")
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
                if len(b)]
    tc = (np.unique(np.concatenate(tc_parts)) if tc_parts
          else np.empty(0, np.int64))
    tc_ref = ray.put(tc)

    def _split(keep_touched: bool):
        def _f(t: pa.Table) -> pa.Table:
            hit = _member(t["cluster_id"], ray.get(tc_ref))
            return t.filter(pa.array(hit if keep_touched else ~hit))
        return _f

    untouched = base.map_batches(_split(False), batch_format="pyarrow")
    # touched rows feed both the star edges and the label-join id list —
    # pin them (slim two-int64 rows, O(touched members)) so the membership
    # scan over the prior clusters runs once, not per consumer
    touched = base.map_batches(_split(True),
                               batch_format="pyarrow").materialize()
    star = touched.map_batches(
        lambda t: pa.table({"a": t["cluster_id"], "b": t["doc_id"]}).filter(
            pc.not_equal(t["cluster_id"], t["doc_id"])),
        batch_format="pyarrow")
    sub_edges = new_edges.union(star)
    sub_ids = touched.select_columns(["doc_id"]).union(ids_B)
    sub = cluster_edges(sub_edges, sub_ids, cfg, strategy=strategy)
    return untouched.union(sub)


def _fold_done(root: str, key: str) -> bool:
    """A fold is complete when its clusters manifest carries the fold's
    lineage key and either the data is present or it was pruned (folded
    into a later link)."""
    import json
    import os
    manifest = os.path.join(root, "clusters", "_MANIFEST.json")
    if not os.path.isfile(manifest):
        return False
    try:
        with open(manifest) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    if m.get("config_hash") != key:
        return False
    return bool(m.get("pruned")) or os.path.isdir(
        os.path.join(root, "clusters", "data"))


def _prune_clusters(root: str) -> None:
    """Drop a superseded fold's clusters DATA (its labels were folded into
    the next link); the manifest stays as lineage, flagged pruned.
    Idempotent — safe to re-run on resume."""
    import json
    import os
    import shutil
    manifest = os.path.join(root, "clusters", "_MANIFEST.json")
    data_dir = os.path.join(root, "clusters", "data")
    if not os.path.isfile(manifest):
        return
    with open(manifest) as f:
        m = json.load(f)
    if not m.get("pruned"):
        m["pruned"] = True
        with open(manifest, "w") as f:
            json.dump(m, f, indent=2)
    if os.path.isdir(data_dir):
        shutil.rmtree(data_dir)


def _prebuild_increment(sroot: str, key: str, ds, cfg: PipelineConfig,
                        passes: tuple, box: dict) -> None:
    """Build a shard's fold-INDEPENDENT artifacts ahead of its turn in a
    ``dedup_sharded`` chain: normalize / signatures / winnow_rows are pure
    functions of the shard's own text (the builders below are verbatim the
    ones ``incremental_update`` runs), so they can be computed while the
    PREVIOUS fold is still linking — the fold's own ``ck.stage`` calls then
    resume them from the manifest, byte-identically. Best-effort: any
    failure here simply leaves the fold to (re)build the stage itself.
    ``box['data']`` hands the resolved dataset to the fold so shard
    factories still run once on the success path."""
    data = ds() if callable(ds) else ds
    box["data"] = data
    if data.limit(1).count() == 0:
        return      # the fold's empty path writes its own artifacts
    ck = Checkpointer(sroot, key)
    ns, ss, ws = _increment_schemas(cfg)
    norm_B = ck.stage("normalize", lambda: normalized_docs(data, cfg),
                      empty_schema=ns)
    if "minhash" in passes or "simhash" in passes:
        ck.stage("signatures", lambda: signature_table(norm_B, cfg),
                 empty_schema=ss)
    if "substring" in passes:
        ck.stage("winnow_rows",
                 lambda: add_stage(norm_B.select_columns(
                     ["doc_id", "norm_text", "tier"]), Winnower, cfg),
                 empty_schema=ws)


def dedup_sharded(shards, state_root: str,
                  cfg: PipelineConfig | None = None,
                  passes: tuple = ("exact", "minhash", "simhash",
                                   "substring"),
                  prune: bool = True):
    """Resumable sharded flagship: fold an ordered list of corpus shards
    into ONE clustering, one ``incremental_update`` link at a time — the
    operational shape of a 10^12-doc run (per-shard checkpoint roots give
    the per-partition lineage + metrics; a killed ``ray job submit`` run
    resumes at its first unfinished fold, and inside that fold at its
    first unfinished stage).

    ``shards``: ordered ``[(label, dataset_or_factory), ...]``. The label
    is the shard's identity in the lineage key (as ``cmd_dedup`` uses the
    input path), so a re-run with the same labels/config/passes skips
    finished folds WITHOUT evaluating their datasets — factories for
    skipped shards are never called. Layout:
    ``state_root/shard-00000-<label>/<stage>/{data,_MANIFEST.json}``.

    Each fold persists the increment's normalize/signatures/winnow_rows
    plus the merged clusters. With ``prune`` the previous fold's clusters
    DATA is dropped once the next fold lands, so checkpoint storage stays
    O(corpus + labels-of-corpus), not O(shards × corpus); the pruned
    manifest remains as lineage. Returns the final (doc_id, cluster_id)
    Dataset — byte-identical to ``find_duplicates`` over the concatenation
    of all shards (tests/test_sharded.py).
    """
    import os
    import re as _re

    import ray.data as rd

    cfg = cfg or PipelineConfig()
    shards = list(shards)
    if not shards:
        raise ValueError("dedup_sharded: no shards")
    labels = [lab for lab, _ in shards]
    if len(set(labels)) != len(labels):
        raise ValueError("dedup_sharded: shard labels must be unique "
                         f"(got {labels!r})")
    def _shard_ck(i: int, label) -> tuple[str, str]:
        safe = _re.sub(r"[^A-Za-z0-9._-]+", "_", str(label)).strip("_")[:80]
        sroot = os.path.join(state_root, f"shard-{i:05d}-{safe}")
        key = (f"{cfg.config_hash()}:{label}:"
               + ",".join(sorted(passes)))
        return sroot, key

    from concurrent.futures import ThreadPoolExecutor

    chain: list[str] = []
    prev_root: str | None = None
    pre: dict[int, tuple] = {}          # shard idx -> (future, box)
    _PRE_WINDOW = 2                     # shards prebuilt ahead of the fold
    with ThreadPoolExecutor(max_workers=_PRE_WINDOW) as _pre_pool:
        for i, (label, ds) in enumerate(shards):
            sroot, key = _shard_ck(i, label)
            if not _fold_done(sroot, key):
                data = None
                if i in pre:
                    fut, box = pre.pop(i)
                    try:
                        fut.result()
                    except Exception:
                        pass    # best-effort: the fold rebuilds the stage
                    data = box.get("data")
                if data is None:
                    data = ds() if callable(ds) else ds
                # Pipelining: the next shards' fold-independent artifacts
                # (normalize / signatures / winnow_rows are functions of
                # each shard's own text, not of any prior fold) build on
                # driver threads WHILE this fold runs; those folds'
                # ck.stage calls then resume them from the manifest —
                # byte-identical output, and the shard-local ~40% of each
                # fold's wall overlaps the chain-dependent part. The
                # window stays small so prebuild work never starves the
                # live fold and checkpoint disk stays O(window · shard).
                for j in range(i + 1, min(i + 1 + _PRE_WINDOW,
                                          len(shards))):
                    if j in pre:
                        continue
                    lab_n, ds_n = shards[j]
                    sroot_n, key_n = _shard_ck(j, lab_n)
                    if not _fold_done(sroot_n, key_n):
                        box_n: dict = {}
                        pre[j] = (_pre_pool.submit(
                            _prebuild_increment, sroot_n, key_n, ds_n,
                            cfg, passes, box_n), box_n)
                ck = Checkpointer(sroot, key)
                if not chain:
                    if data.limit(1).count() == 0:
                        # an empty FIRST shard still writes a valid chain
                        # link (find_duplicates' empty fast path writes no
                        # stages)
                        ns, ss, ws = _increment_schemas(cfg)
                        cl = pa.schema([("doc_id", pa.int64()),
                                        ("cluster_id", pa.int64())])
                        for name, sch in (("normalize", ns),
                                          ("signatures", ss),
                                          ("winnow_rows", ws),
                                          ("clusters", cl)):
                            ck.stage(name, lambda sch=sch: rd.from_arrow(
                                sch.empty_table()), empty_schema=sch)
                    else:
                        find_duplicates(data, cfg, checkpointer=ck,
                                        passes=passes)
                else:
                    incremental_update(chain, data, cfg, passes=passes,
                                       checkpointer=ck)
            if prune and prev_root is not None:
                _prune_clusters(prev_root)
            chain.append(sroot)
            prev_root = sroot
    # Guard: re-running with a TRUNCATED shard list against a state_root
    # from a longer completed run finds every fold done — but the last
    # requested shard's clusters data was pruned when the longer run's next
    # fold landed. Fail with intent instead of an opaque read error.
    import json as _json
    last_manifest = os.path.join(prev_root, "clusters", "_MANIFEST.json")
    try:
        with open(last_manifest) as f:
            _m = _json.load(f)
    except (OSError, _json.JSONDecodeError):
        _m = {}
    if _m.get("pruned"):
        raise ValueError(
            f"dedup_sharded: the final shard's clusters at {prev_root!r} "
            "were pruned — this state_root belongs to a LONGER completed "
            "chain than the shard list passed here. Re-run with the full "
            "shard list, or use a fresh state_root for the shorter chain.")
    return rd.read_parquet(os.path.join(prev_root, "clusters", "data"))
