"""Clustering-agreement metrics: hand-computed pair-counting oracle,
structural invariants, and the flagship recall gate through the operator."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def _labeling(pairs):
    t = pa.table({"doc_id": pa.array([a for a, _ in pairs], pa.int64()),
                  "cluster_id": pa.array([b for _, b in pairs], pa.int64())})
    return rd.from_arrow(t)


def test_agreement_hand_computed(ray_session):
    """truth {0,1,2}{3,4}{5} vs found {0,1}{2,3}{4}{5}:
    truth_pairs C(3,2)+C(2,2)=4, found_pairs 2, common cells:
    (t0,f0)={0,1}→1 pair; (t0,f1)={2}; (t3,f1)={3}; (t3,f2)={4} ⇒ 1."""
    from fuzzy_matcher_ray.pipelines.evaluation import clustering_agreement
    truth = _labeling([(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5)])
    found = _labeling([(0, 0), (1, 0), (2, 2), (3, 2), (4, 4), (5, 5)])
    out = clustering_agreement(truth, found).to_pydict()
    assert out["n_items"] == [6]
    assert out["truth_pairs"] == [4]
    assert out["found_pairs"] == [2]
    assert out["common_pairs"] == [1]
    assert out["recall_pm"] == [250]
    assert out["precision_pm"] == [500]


def test_agreement_identity_and_degenerate(ray_session):
    from fuzzy_matcher_ray.pipelines.evaluation import clustering_agreement
    same = _labeling([(0, 0), (1, 0), (2, 2)])
    out = clustering_agreement(same, same).to_pydict()
    assert out["recall_pm"] == [1000] and out["precision_pm"] == [1000]
    singletons = _labeling([(0, 0), (1, 1), (2, 2)])
    out = clustering_agreement(singletons, singletons).to_pydict()
    assert out["truth_pairs"] == [0]
    assert out["recall_pm"] == [-1] and out["precision_pm"] == [-1]


def test_agreement_thresholds_containment(ray_session):
    """found(0.8) pairs are contained in truth(0.2) closures ⇒ precision
    exactly 1000, recall ≤ 1000, on the driver testdata."""
    from fuzzy_matcher_ray.pipelines.evaluation import agreement_thresholds
    out = agreement_thresholds("/root/testdata/sf0.001").to_pydict()
    assert out["precision_pm"] == [1000]
    assert out["common_pairs"] == out["found_pairs"]
    assert out["common_pairs"][0] <= out["truth_pairs"][0]
    assert out["n_items"] == [500]


def test_flagship_recall_gate_through_operator(ray_session):
    """The north-rule criterion measured BY the operator: flagship recall
    ≥ 990 per-mille against the exact all-pairs baseline."""
    from fuzzy_matcher_ray.pipelines.evaluation import dedup_eval_report
    out = dedup_eval_report("/root/testdata/sf0.001").to_pydict()
    assert out["recall_pm"][0] >= 990, out
    assert out["truth_pairs"][0] > 0