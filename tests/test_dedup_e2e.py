"""E2E flagship pipeline vs a brute-force O(n²) oracle (SURVEY.md §5 port
strategy (b)): planted-duplicate corpus, dup-pair recall >= 0.99, cluster
sanity, driver vs distributed clustering equality."""

import numpy as np
import pyarrow as pa
import pytest

from fuzzy_matcher_ray.config import PipelineConfig
from fuzzy_matcher_ray.functions.normalize import normalize_array
from fuzzy_matcher_ray.functions.shingle import (
    counts_to_offsets, shingle_batch, unique_per_doc)
from fuzzy_matcher_ray.functions.unionfind import connected_components
from fuzzy_matcher_ray.sources.webpages import make_webpages

N_DOCS = 400
CFG = PipelineConfig()


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd
    pages, truth = make_webpages(N_DOCS, seed=42)
    docs_tbl = pa.table({
        "doc_id": pa.array(range(len(pages)), pa.int64()),
        "url": pages["url"], "text": pages["text"], "lang": pages["lang"]})
    return rd.from_arrow(docs_tbl), docs_tbl, truth


def brute_force_pairs(texts: list[str], threshold: float) -> set[tuple[int, int]]:
    """All (i, j) with exact 5-gram Jaccard >= threshold on normalized text."""
    norm = normalize_array(pa.array(texts, pa.string()))
    uh, uc = unique_per_doc(*shingle_batch(norm, CFG.shingle_k, CFG.seed))
    offs = counts_to_offsets(uc)
    sets = [uh[offs[i]: offs[i + 1]] for i in range(len(texts))]
    out = set()
    for i in range(len(texts)):
        si = sets[i]
        if len(si) == 0:
            continue
        for j in range(i + 1, len(texts)):
            sj = sets[j]
            if len(sj) == 0:
                continue
            inter = len(np.intersect1d(si, sj, assume_unique=True))
            if inter / (len(si) + len(sj) - inter) >= threshold:
                out.add((i, j))
    return out


def test_minhash_recall_vs_bruteforce(corpus):
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    docs, docs_tbl, _ = corpus
    out = find_duplicates(docs, CFG, passes=("exact", "minhash"),
                          cluster_strategy="driver").to_pandas()
    label = dict(zip(out.doc_id, out.cluster_id))
    texts = docs_tbl["text"].to_pylist()
    truth_pairs = brute_force_pairs(texts, CFG.jaccard_threshold)
    assert truth_pairs, "oracle found no duplicate pairs — corpus broken"
    found = sum(1 for (i, j) in truth_pairs if label[i] == label[j])
    recall = found / len(truth_pairs)
    assert recall >= 0.99, f"recall {recall:.3f} over {len(truth_pairs)} true pairs"
    # sanity: no catastrophic over-merging (transitive closure may merge some)
    sizes = out.groupby("cluster_id").size()
    assert sizes.max() <= 40


def test_full_pipeline_clusters(corpus):
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    docs, docs_tbl, truth = corpus
    out = find_duplicates(docs, CFG).to_pandas()
    assert len(out) == N_DOCS
    assert set(out.columns) >= {"doc_id", "cluster_id", "url"}
    label = dict(zip(out.doc_id, out.cluster_id))
    # exact copies must always co-cluster
    texts = docs_tbl["text"].to_pylist()
    norm = normalize_array(pa.array(texts, pa.string())).to_pylist()
    by_text = {}
    for i, t in enumerate(norm):
        if t:
            by_text.setdefault(t, []).append(i)
    for ids in by_text.values():
        for j in ids[1:]:
            assert label[ids[0]] == label[j], "exact copies split across clusters"
    # empty docs must stay singletons (never glued into one mega-cluster)
    empties = [i for i, t in enumerate(norm) if not t]
    assert len({label[i] for i in empties}) == len(empties)


def test_driver_vs_distributed_clustering(corpus):
    import ray.data as rd
    from fuzzy_matcher_ray.stages.cluster import cluster_edges
    docs, _, _ = corpus
    edges = rd.from_arrow(pa.table({
        "a": pa.array([0, 1, 5, 6, 7], pa.int64()),
        "b": pa.array([1, 2, 6, 7, 8], pa.int64())}))
    ids = docs.select_columns(["doc_id"])
    d1 = cluster_edges(edges, ids, CFG, strategy="driver").to_pandas()
    d2 = cluster_edges(edges, ids, CFG, strategy="distributed").to_pandas()
    m1 = dict(zip(d1.doc_id, d1.cluster_id))
    m2 = dict(zip(d2.doc_id, d2.cluster_id))
    assert m1 == m2
    assert m1[0] == m1[1] == m1[2] == 0
    assert m1[5] == m1[8] == 5
    assert m1[100] == 100


def test_substring_pass_links_containment(ray_session):
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    rng = np.random.default_rng(5)
    shared = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], 120))
    docs_tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "url": pa.array(["u0", "u1", "u2"]),
        "text": pa.array([shared + " tail one here",
                          "prefix two " + shared,
                          " ".join(rng.choice(["x1", "y2", "z3"], 200))]),
        "lang": pa.array(["en"] * 3)})
    out = find_duplicates(rd.from_arrow(docs_tbl), CFG,
                          passes=("substring",)).to_pandas()
    label = dict(zip(out.doc_id, out.cluster_id))
    assert label[0] == label[1] != label[2]
