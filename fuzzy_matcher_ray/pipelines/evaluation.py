"""Clustering-agreement metrics: pair-counting recall / precision between
two (doc_id, cluster_id) labelings — the north rule's own acceptance
criterion ("dup-pair recall ≥ 0.99 vs reference clusters") surfaced as an
operator, so a curation run can measure its dedup quality in-pipeline.

Pair counting (the Rand-index family, public formulation): a labeling
with cluster sizes n_c induces Σ C(n_c, 2) within-cluster pairs; the pairs
common to two labelings are Σ C(n_cell, 2) over the contingency cells
(truth_label × found_label). recall = common / truth_pairs and
precision = common / found_pairs — exact integers, reported per-mille.

Shape: one inner join on doc_id (``attach_columns``) + three
groupby-counts; the C(n,2) sums reduce via per-batch partials into a
``Sum`` aggregate, so nothing cluster-count-sized reaches the driver. The
metric kernel itself is SQL-expressible and hash-checked by the
``agreement_thresholds`` contract row (its two input clusterings are the
exact all-pairs Jaccard closure at two thresholds, each with an exact
DuckDB oracle); ``dedup_eval_report`` then applies the same kernel to
the flagship — whose labeling is the engine under test, hence rows-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_REPORT_SCHEMA = pa.schema([
    ("n_items", pa.int64()), ("truth_pairs", pa.int64()),
    ("found_pairs", pa.int64()), ("common_pairs", pa.int64()),
    ("recall_pm", pa.int64()), ("precision_pm", pa.int64())])


def _pair_sum(labeled, cols: list[str]):
    """Σ C(n, 2) over the groups of ``cols`` — per-batch partial C(n,2)
    after the groupby's exact counts, one scalar out."""
    from ray.data.aggregate import Count, Sum

    counts = labeled.groupby(cols).aggregate(Count(alias_name="n"))

    def _choose2(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"p": pa.array(n * (n - 1) // 2, pa.int64())})

    out = counts.map_batches(_choose2, batch_format="pyarrow") \
        .aggregate(Sum("p", alias_name="p"))
    return int(out["p"] or 0)


def clustering_agreement(truth, found, key: str = "doc_id",
                         label: str = "cluster_id") -> pa.Table:
    """One-row (n_items, truth_pairs, found_pairs, common_pairs,
    recall_pm, precision_pm) comparing ``found`` against ``truth`` (both
    Datasets of (key, label)). Items present in only one side are
    dropped by the inner join. Per-mille values are exact integer floors;
    a zero denominator reports -1 (documented sentinel)."""
    from fuzzy_matcher_ray.stages.joins import attach_columns

    t = truth.select_columns([key, label])

    def _ren_t(tb: pa.Table) -> pa.Table:
        return pa.table({key: tb[key], "truth_label": tb[label]})

    def _ren_f(tb: pa.Table) -> pa.Table:
        return pa.table({key: tb[key], "found_label": tb[label]})

    tt = t.map_batches(_ren_t, batch_format="pyarrow")
    ff = found.select_columns([key, label]) \
        .map_batches(_ren_f, batch_format="pyarrow")
    joined = attach_columns(tt, ff, key, key,
                            {"found_label": "found_label"},
                            how="inner").materialize()
    n_items = joined.count()
    truth_pairs = _pair_sum(joined, ["truth_label"])
    found_pairs = _pair_sum(joined, ["found_label"])
    common_pairs = _pair_sum(joined, ["truth_label", "found_label"])
    recall_pm = (1000 * common_pairs) // truth_pairs if truth_pairs else -1
    precision_pm = (1000 * common_pairs) // found_pairs if found_pairs \
        else -1
    return pa.table({
        "n_items": pa.array([n_items], pa.int64()),
        "truth_pairs": pa.array([truth_pairs], pa.int64()),
        "found_pairs": pa.array([found_pairs], pa.int64()),
        "common_pairs": pa.array([common_pairs], pa.int64()),
        "recall_pm": pa.array([recall_pm], pa.int64()),
        "precision_pm": pa.array([precision_pm], pa.int64())})


def agreement_thresholds(sf_dir: str, t_truth: float = 0.2,
                         t_found: float = 0.8) -> pa.Table:
    """Contract row for the metric kernel: the exact all-pairs Jaccard
    clustering at threshold 0.8 scored against the same clustering at 0.2
    — BOTH inputs have DuckDB oracles (the same recursive-CTE closure at
    two thresholds), so the whole report is hash-checked. Every ≥0.8 pair
    is a ≥0.2 pair and closures preserve containment, so precision_pm is
    1000 by construction while recall_pm < 1000 measures the near-dup
    mass between the two thresholds."""
    from fuzzy_matcher_ray.pipelines.dedup import jaccard_allpairs_clusters
    from fuzzy_matcher_ray.sources.protocol import documents_source
    truth = jaccard_allpairs_clusters(documents_source(sf_dir),
                                      threshold=t_truth)
    found = jaccard_allpairs_clusters(documents_source(sf_dir),
                                      threshold=t_found)
    return clustering_agreement(truth, found)


def dedup_eval_report(sf_dir: str) -> pa.Table:
    """The north-rule acceptance metric in-pipeline: the flagship
    ``find_duplicates`` clustering scored against the exact all-pairs
    Jaccard baseline (same threshold). recall_pm ≥ 990 is the shipped
    gate (asserted in tests at fixture scale); precision below 1000 is
    expected — transitive closure over a pair graph legitimately merges
    chains the pairwise oracle scores independently."""
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines.dedup import (find_duplicates,
                                                   jaccard_allpairs_clusters)
    from fuzzy_matcher_ray.sources.protocol import documents_source
    truth = jaccard_allpairs_clusters(documents_source(sf_dir))
    found = find_duplicates(documents_source(sf_dir), PipelineConfig())
    return clustering_agreement(truth, found)
