"""Hashed text embeddings: exact plain-Python reference, unit-norm and
determinism invariants, and composition with the knn/semantic tiers."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def corpus(tmp_path):
    texts = ["cat dog cat", "cat dog cat", "dog fish", "", None,
             "completely different words entirely"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path), texts


def _ref_embed(text, dim):
    from fuzzy_matcher_ray.functions.fingerprint import content_hash
    from fuzzy_matcher_ray.functions.shingle import splitmix64
    from fuzzy_matcher_ray.pipelines.embed import _EMBED_SEED
    v = np.zeros(dim)
    toks = [w for w in (text or "").lower().split(" ") if w]
    if toks:
        h = content_hash(pa.array(toks, pa.string())).astype(np.uint64)
        h = splitmix64(h ^ _EMBED_SEED)
        for hh in h:
            # int() first: np.uint64 % python-int silently degrades to
            # float64 and rounds large hashes before the modulo
            v[int(hh) % dim] += 1.0 if (int(hh) >> 63) else -1.0
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def test_embed_matches_reference(ray_session, corpus):
    from fuzzy_matcher_ray.pipelines.embed import embed_documents
    sf, texts = corpus
    out = {r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
           for r in embed_documents(sf, dim=16).take_all()}
    for i, t in enumerate(texts):
        assert np.array_equal(out[i], _ref_embed(t, 16)), i
    # identical docs → identical vectors; empty/null → zero vectors
    assert np.array_equal(out[0], out[1])
    assert not out[3].any() and not out[4].any()
    nz = [k for k, v in out.items() if v.any()]
    for k in nz:
        assert abs(float(np.linalg.norm(out[k].astype(np.float64))) - 1.0) \
            < 1e-6


def test_text_knn_composition(ray_session, corpus):
    """The generated artifact feeds knn_topk unchanged; the exact-copy
    pair must be each other's top neighbor at cosine 1."""
    from fuzzy_matcher_ray.pipelines.embed import text_knn_topk
    sf, _ = corpus
    out = text_knn_topk(sf, dim=16, n_queries=1, k=2).to_pandas()
    top0 = out[out.query_id == 0].iloc[0]
    assert top0.neighbor_id == 1 and top0.cosine == 1.0


def test_text_semantic_composition(ray_session, corpus):
    from fuzzy_matcher_ray.pipelines.embed import text_semantic_clusters
    sf, texts = corpus
    out = text_semantic_clusters(sf, dim=16, k=2, iters=2).to_pandas()
    assert len(out) == len(texts)
    by_id = dict(zip(out.vec_id, out.cluster_id))
    assert by_id[0] == by_id[1]                 # exact copies co-cluster


def test_artifact_idempotent(ray_session, corpus):
    import os

    from fuzzy_matcher_ray.pipelines.embed import text_embeddings_artifact
    sf, _ = corpus
    d1 = text_embeddings_artifact(sf, dim=16)
    m = os.path.getmtime(os.path.join(d1, "embeddings.parquet"))
    d2 = text_embeddings_artifact(sf, dim=16)
    assert d1 == d2
    assert os.path.getmtime(os.path.join(d2, "embeddings.parquet")) == m
