"""Null/empty-text parity sweep: every documents-only oracle-checked query
runs over a synthetic documents table CONTAINING null and empty texts, and
must still match its DuckDB oracle. The driver fixtures carry no nulls, so
the standard contract cannot catch NULL-semantics divergence between the
Arrow kernels (fill_null habits) and SQL (NULL propagation)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod

# documents-only queries with SQL oracles (others touch more tables)
DOC_QUERIES = [
    "normalize_text", "exact_dedup_first", "exact_clusters", "token_counts",
    "text_quality", "lang_guess", "topk_longest", "docs_by_lang_source",
    "ngram_jaccard_adjacent", "span_dedup", "url_collapse", "chunk_documents",
    "redact_pii", "sample_stratified", "shuffle_epoch", "top_ngrams",
    "repetition_scores", "quality_filter", "decontaminate", "topk_per_source",
    "dedup_jaccard_brute", "cluster_representatives", "tfidf_top_terms",
    "bm25_search", "unigram_doc_logprob", "host_stats", "host_block_filter",
    "normalize_nfc", "host_cap", "cluster_size_histogram",
    "tfidf_top_terms_join", "unigram_doc_logprob_join",
    "host_dup_stats", "quality_prune", "mix_epochs", "contamination_scores",
    "neardup_contamination", "boilerplate_prune", "pack_sequences",
    "agreement_thresholds", "ccnet_buckets",
    "tiered_dedup", "soft_dedup_weights", "tier_counts",
    "keep_best_representatives",
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullsf")
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for i in range(60):
        if i % 11 == 3:
            texts.append(None)
        elif i % 11 == 7:
            texts.append("")
        else:
            n = int(rng.integers(3, 40))
            texts.append(" ".join(rng.choice(vocab, n)))
    tbl = pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(60)]),
        "source": pa.array([f"src{i % 4}" for i in range(60)]),
        "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_con(null_sf):
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{null_sf}/documents.parquet'")
    yield con
    con.close()


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_null_text_query_matches_oracle(name, null_sf, null_con, ray_session):
    mine = _to_pandas(entry_mod.queries()[name](null_sf))
    oracle = null_con.sql(entry_mod.oracle_sql()[name]).df()
    if len(mine) == 0 and len(oracle) == 0:
        # Ray's to_pandas on a zero-row Dataset always yields a frame with
        # no columns (framework behavior) — both-empty is a match
        return
    cols = sorted(mine.columns)
    assert cols == sorted(oracle.columns), (cols, sorted(oracle.columns))
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
