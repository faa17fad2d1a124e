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


def _ntile_ref(df, k=3):
    """Plain-pandas reference of per-lang SQL ntile(k) over
    (avg_lp_e9 DESC, doc_id ASC) — independent of the pipeline's
    position-stamp machinery."""
    out = {}
    for _, g in df.groupby("lang"):
        g = g.sort_values(["avg_lp_e9", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
        n = len(g)
        q, r = divmod(n, k)
        for i, doc in enumerate(g.doc_id):
            b = (i // (q + 1) if i < r * (q + 1)
                 else r + (i - r * (q + 1)) // max(q, 1))
            out[doc] = b + 1
    return out


def test_ccnet_buckets_matches_driver_reference(ray_session, tmp_path):
    """ccnet_buckets == avg-floor-div + per-lang ntile computed driver-side
    from unigram_doc_logprob's (independently planted-tested) output;
    covers n % k != 0, n < k, and null/empty docs."""
    from fuzzy_matcher_ray.pipelines.relevance import (ccnet_buckets,
                                                       unigram_doc_logprob)
    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    langs = ["en"] * 7 + ["de"] * 2 + ["fr"] * 5
    texts = []
    for i in range(len(langs)):
        if i == 4:
            texts.append(None)          # en: tokenless → avg 0 → head
        elif i == 9:
            texts.append("")            # fr: tokenless → avg 0 → head
        else:
            texts.append(" ".join(
                rng.choice(vocab, int(rng.integers(2, 12)))))
    tbl = pa.table({"doc_id": pa.array(range(len(langs)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    out = ccnet_buckets(sf).to_pandas()
    base = unigram_doc_logprob(sf).to_pandas()
    base["lang"] = [langs[i] for i in base.doc_id]
    base["avg_lp_e9"] = [(lp // nt) if nt else 0
                         for lp, nt in zip(base.logprob_e9, base.n_tokens)]
    assert dict(zip(out.doc_id, out.avg_lp_e9)) == \
        dict(zip(base.doc_id, base.avg_lp_e9))
    assert dict(zip(out.doc_id, out.bucket)) == _ntile_ref(base)
    # scores are negative, tokenless avg 0 is the max → head bucket
    assert out.loc[out.doc_id == 4, "bucket"].item() == 1
    assert out.loc[out.doc_id == 9, "bucket"].item() == 1
    # n < k language: each row its own bucket, 1-based from the top
    assert sorted(out[out.lang == "de"].bucket.tolist()) == [1, 2]
    # the vocab hash-join path is byte-identical through the bucketing
    j = ccnet_buckets(sf, vocab_strategy="join").to_pandas() \
        .reset_index(drop=True)
    assert out.reset_index(drop=True).equals(j)


def test_ccnet_buckets_empty_corpus(ray_session, tmp_path):
    """Zero-row corpus: Ray infers no schema for the empty read — the
    early return must fire before the lang attach tries to collect it."""
    from fuzzy_matcher_ray.pipelines.relevance import ccnet_buckets
    pq.write_table(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string()),
                             "lang": pa.array([], pa.string())}),
                   str(tmp_path / "documents.parquet"))
    out = ccnet_buckets(str(tmp_path))
    assert out.count() == 0
    assert {"doc_id", "lang", "n_tokens", "avg_lp_e9",
            "bucket"} <= set(out.schema().names)
