"""TF-IDF / BM25 relevance ops: hand-computed planted oracles (independent
of DuckDB — the driver-contract suite holds the SQL parity check)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tiny_corpus(tmp_path):
    texts = ["cat dog cat", "dog fish", "cat cat cat bird", None, ""]
    tbl = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path), texts


def test_tfidf_planted_exact(ray_session, tiny_corpus):
    from fuzzy_matcher_ray.pipelines.relevance import tfidf_top_terms
    sf, texts = tiny_corpus
    out = tfidf_top_terms(sf, k=2).to_pandas()
    n = 5
    df = {"cat": 2, "dog": 2, "fish": 1, "bird": 1}

    def score(tf, term):
        idf = math.log((n + 1) / (df[term] + 1)) + 1
        return math.floor(tf * idf * 1e6 + 0.5) / 1e6

    # doc 0: cat tf=2, dog tf=1 → cat first
    d0 = out[out.doc_id == 0]
    assert d0.term.tolist() == ["cat", "dog"]
    assert d0.score.tolist() == [score(2, "cat"), score(1, "dog")]
    # doc 1: dog=1, fish=1 — fish has higher idf
    d1 = out[out.doc_id == 1]
    assert d1.term.tolist() == ["fish", "dog"]
    # doc 2: cat tf=3 beats bird tf=1 (idf gap < tf gap here)
    d2 = out[out.doc_id == 2]
    assert d2.term.tolist()[0] == ("cat" if score(3, "cat") >= score(1, "bird")
                                   else "bird")
    # null / empty docs contribute no rows
    assert set(out.doc_id) == {0, 1, 2}
    assert (out.groupby("doc_id").rnk.min() == 1).all()


def test_tfidf_min_df_prunes(ray_session, tiny_corpus):
    from fuzzy_matcher_ray.pipelines.relevance import tfidf_top_terms
    sf, _ = tiny_corpus
    out = tfidf_top_terms(sf, k=3, min_df=2).to_pandas()
    assert set(out.term) == {"cat", "dog"}      # fish/bird pruned at df=1


def test_bm25_planted_ranking(ray_session, tiny_corpus):
    """Top-df query terms are (cat, dog) (+bird/fish tie broken asc);
    doc 0 (cat+dog, short) must outrank the null/empty docs, and every
    score must match the hand formula."""
    from fuzzy_matcher_ray.pipelines.relevance import bm25_search
    sf, texts = tiny_corpus
    out = bm25_search(sf, n_query_terms=2, k=5).to_pandas()
    n, k1, b = 5, 1.2, 0.75
    df = {"cat": 2, "dog": 2}
    tfs = {0: {"cat": 2, "dog": 1}, 1: {"dog": 1}, 2: {"cat": 3}}
    dls = {0: 3, 1: 2, 2: 4, 3: 0, 4: 0}
    avgdl = sum(dls.values()) / n

    def e9(doc):
        tot = 0
        for t in ("cat", "dog"):
            tf = tfs.get(doc, {}).get(t, 0)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * (tf / (tf + k1 * (1 - b + b * (dls[doc] / avgdl))))
            tot += math.floor(s * 1e9 + 0.5)
        return tot

    exp = sorted(range(5), key=lambda d: (-e9(d), d))
    assert out.doc_id.tolist() == exp
    for _, row in out.iterrows():
        assert row.score == pytest.approx(e9(int(row.doc_id)) / 1e9,
                                          abs=1e-12)


def test_unigram_logprob_planted_exact(ray_session, tiny_corpus):
    from fuzzy_matcher_ray.pipelines.relevance import unigram_doc_logprob
    sf, texts = tiny_corpus
    out = unigram_doc_logprob(sf).to_pandas()
    assert out.doc_id.tolist() == [0, 1, 2, 3, 4]
    # manual model: counts over all 5 docs (null/empty contribute nothing)
    toks = [t for s in texts if s for t in s.lower().split(" ") if t]
    cnt = {w: toks.count(w) for w in set(toks)}
    n = float(len(toks))
    lw = {w: math.floor(math.log(c / n) * 1e9 + 0.5) for w, c in cnt.items()}
    for i, s in enumerate(texts):
        ts = [t for t in (s or "").lower().split(" ") if t]
        assert out.n_tokens[i] == len(ts)
        assert out.logprob_e9[i] == sum(lw[t] for t in ts)
    # a doc of common tokens outscores one with a rare token, per token
    mean = out.logprob_e9 / out.n_tokens.clip(lower=1)
    assert mean[0] > mean[1]  # "cat dog cat" vs "dog fish" (fish is hapax)


def test_unigram_logprob_empty_corpus(ray_session, tmp_path):
    from fuzzy_matcher_ray.pipelines.relevance import unigram_doc_logprob
    tbl = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "text": pa.array([None], pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = unigram_doc_logprob(str(tmp_path)).to_pandas()
    assert out.doc_id.tolist() == [7]
    assert out.n_tokens.tolist() == [0]
    assert out.logprob_e9.tolist() == [0]


def test_relevance_ops_empty_and_termless_corpus(ray_session, tmp_path):
    """Zero-row and all-null corpora flow through every relevance op
    without crashing (the zero-batch collect class of bug)."""
    from fuzzy_matcher_ray.pipelines.relevance import (bm25_search,
                                                       tfidf_top_terms,
                                                       unigram_doc_logprob)
    for case, texts in (("empty", []), ("termless", [None, None])):
        d = tmp_path / case
        d.mkdir()
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())})
        pq.write_table(tbl, str(d / "documents.parquet"))
        assert bm25_search(str(d)).count() == 0
        assert tfidf_top_terms(str(d)).count() == 0
        assert unigram_doc_logprob(str(d)).count() == len(texts)


def test_vocab_join_path_byte_parity(ray_session):
    """The open-web-scale vocab hash-join path must be BYTE-IDENTICAL to
    the broadcast path for both TF-IDF and the unigram LM (fixed-point
    logs / identical IEEE score expressions make order irrelevant)."""
    from fuzzy_matcher_ray.pipelines.relevance import (tfidf_top_terms,
                                                       unigram_doc_logprob)
    sf = "/root/testdata/sf0.001"
    for fn in (tfidf_top_terms, unigram_doc_logprob):
        b = fn(sf, vocab_strategy="broadcast").to_pandas() \
            .reset_index(drop=True)
        j = fn(sf, vocab_strategy="join").to_pandas().reset_index(drop=True)
        assert len(b) > 0 and b.equals(j), fn.__name__


def test_vocab_join_path_termless(ray_session, tmp_path):
    """Join path survives a termless corpus (zero vocab rows)."""
    from fuzzy_matcher_ray.pipelines.relevance import (tfidf_top_terms,
                                                       unigram_doc_logprob)
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([None, ""], pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    assert tfidf_top_terms(str(tmp_path), vocab_strategy="join").count() == 0
    out = unigram_doc_logprob(str(tmp_path), vocab_strategy="join") \
        .to_pandas()
    assert out.n_tokens.tolist() == [0, 0]
