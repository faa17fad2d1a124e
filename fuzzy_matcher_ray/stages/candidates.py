"""Candidate-pair generation from key rows, with explicit skew handling.

≙ reference candidate emission at trie terminals
(``utils.go:28-40`` ProcessNode → MatchCandidate): docs sharing an LSH key
become candidate pairs. The wide shuffle (SURVEY.md §2.6 "result merge") is an
explicit hash-partitioned self-join on the key.

Skew handling (the north rule's hard part): boilerplate/empty-page keys can
hold millions of docs, and an all-pairs self-join on such a key is O(n²) in
one partition. So:

1. A cheap ``groupby(key).count()`` pass finds hot keys (> max_group).
2. Cold rows take the self-join (every group ≤ max_group ⇒ bounded fan-out).
3. Hot groups emit **star + chain** edges (2n-3 per group, vectorized) instead
   of all pairs — connectivity-equivalent for clustering, and since giant LSH
   groups are near-certainly true duplicate clusters, the verify stage prunes
   any accidental bridge while union-find restores transitivity.

Pair order is normalized (a < b) and pairs are deduped across keys with a
``groupby`` — ≙ visited-set dedup (``utils.go:70-77`` MakeKey).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from fuzzy_matcher_ray.config import PipelineConfig
from fuzzy_matcher_ray.functions.shingle import splitmix64

_EMPTY_PAIRS = pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})


def _combined_key(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Mix multiple key columns into one uint64 for hot-set membership tests."""
    acc = np.zeros(len(batch), dtype=np.uint64)
    for i, c in enumerate(key_cols):
        v = batch[c].to_numpy(zero_copy_only=False).astype(np.int64, copy=False).view(np.uint64)
        acc = splitmix64(acc ^ (v + np.uint64(0x9E37 + i)))
    return acc


def _count_col(counts_ds) -> str:
    sch = counts_ds.schema()
    if sch is None:
        return "count()"
    return next((c for c in sch.names if c.startswith("count")), "count()")


def key_pairs(key_rows, key_cols: list[str], cfg: PipelineConfig,
              carry_cols: list[str] | None = None,
              pair_filter=None):
    """key rows (key..., doc_id [, carry…]) → unique candidate pairs (a, b).

    ``carry_cols`` values ride along as ``<col>_a`` / ``<col>_b`` through the
    join so per-pair filters (e.g. SimHash Hamming distance) can run inline
    before the dedup shuffle. ``pair_filter(table) -> table`` runs per joined
    batch.
    """
    carry_cols = carry_cols or []
    # key_rows feeds three consumers (counts, cold, hot) — pin its blocks so
    # the signature stage runs once, not three times. Band rows are ~100x
    # smaller than the corpus text; the object store spills them if needed.
    key_rows = key_rows.materialize()
    if key_rows.count() == 0:
        import ray.data as rd
        cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        for c in carry_cols:
            cols[f"{c}_a"] = pa.array([], pa.int64())
            cols[f"{c}_b"] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(cols))
    counts = key_rows.groupby(key_cols).count()
    ccol = _count_col(counts)
    hot_keys_tbl = counts.map_batches(
        lambda t: t.filter(pc.greater(t[ccol], pa.scalar(cfg.max_band_group))),
        batch_format="pyarrow").select_columns(key_cols)
    # hot keys are few by construction (they exceed max_group) → safe to collect
    hot_batches = list(hot_keys_tbl.iter_batches(batch_size=1 << 20,
                                                 batch_format="pyarrow"))
    hot = (pa.concat_tables(hot_batches) if hot_batches
           else pa.table({c: pa.array([], pa.int64()) for c in key_cols}))
    hot_arr = np.unique(_combined_key(hot, key_cols)) if len(hot) else np.empty(0, np.uint64)
    hot_ref = ray.put(hot_arr)

    def _split(batch: pa.Table, keep_hot: bool) -> pa.Table:
        hs = ray.get(hot_ref)
        if len(hs) == 0:
            return batch if not keep_hot else batch.slice(0, 0)
        k = _combined_key(batch, key_cols)
        mask = np.isin(k, hs)
        return batch.filter(pa.array(mask if keep_hot else ~mask))

    cold = key_rows.map_batches(lambda t: _split(t, False), batch_format="pyarrow")
    # --- cold path: hash self-join, normalize order, inline filter ---
    from fuzzy_matcher_ray.stages.joins import JOIN_AGG_ARGS, effective_partitions
    joined = cold.join(cold, "inner", effective_partitions(cfg.join_num_partitions),
                       on=tuple(key_cols), left_suffix="_a", right_suffix="_b",
                       aggregator_ray_remote_args=JOIN_AGG_ARGS)

    def _orient(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _pairs_schema(t, carry_cols)
        a = t["doc_id_a"].to_numpy(zero_copy_only=False)
        b = t["doc_id_b"].to_numpy(zero_copy_only=False)
        keep = a < b
        t = t.filter(pa.array(keep))
        if pair_filter is not None:
            t = pair_filter(t)
        cols = {"a": t["doc_id_a"], "b": t["doc_id_b"]}
        for c in carry_cols:
            cols[f"{c}_a"] = t[f"{c}_a"]
            cols[f"{c}_b"] = t[f"{c}_b"]
        return pa.table(cols)

    cold_pairs = joined.map_batches(_orient, batch_format="pyarrow")

    # --- hot path: star + chain per group (vectorized, O(n) per group) ---
    if len(hot_arr):
        hot_rows = key_rows.map_batches(lambda t: _split(t, True), batch_format="pyarrow")

        def _star_chain(group: pa.Table) -> pa.Table:
            ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
            if len(ids) < 2:
                return _EMPTY_PAIRS
            root = ids[0]
            a = np.concatenate([np.full(len(ids) - 1, root), ids[1:-1]])
            b = np.concatenate([ids[1:], ids[2:]])
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            t = pa.table({"a": pa.array(lo), "b": pa.array(hi)})
            return t

        hot_pairs = hot_rows.groupby(key_cols).map_groups(
            _star_chain, batch_format="pyarrow")
        # hot pairs skip pair_filter by design: giant groups are exact-ish
        # duplicate families; verify stage still scores every pair.
        for c in carry_cols:
            hot_pairs = hot_pairs.map_batches(
                lambda t: t.append_column(f"{c}_a", pa.nulls(len(t), pa.int64()))
                           .append_column(f"{c}_b", pa.nulls(len(t), pa.int64())),
                batch_format="pyarrow")
        cold_pairs = cold_pairs.union(hot_pairs)
    return dedup_pairs(cold_pairs, carry_cols)


def _pairs_schema(t: pa.Table, carry_cols):
    cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    for c in carry_cols:
        typ = t[f"{c}_a"].type if f"{c}_a" in t.schema.names else pa.int64()
        cols[f"{c}_a"] = pa.array([], typ)
        cols[f"{c}_b"] = pa.array([], typ)
    return pa.table(cols)


def dedup_pairs(pairs, carry_cols: list[str] | None = None):
    """Each (a,b) exactly once — verify-once semantics (min-edit merge ≙
    fuzzy_matcher_core.go:198-205 keeps one row per pair)."""
    carry_cols = carry_cols or []
    if carry_cols:
        aggs = __import__("ray.data.aggregate", fromlist=["Min"])
        mins = [aggs.Min(f"{c}_{s}", alias_name=f"{c}_{s}")
                for c in carry_cols for s in ("a", "b")]
        return pairs.groupby(["a", "b"]).aggregate(*mins)
    counted = pairs.groupby(["a", "b"]).count()
    return counted.select_columns(["a", "b"])
