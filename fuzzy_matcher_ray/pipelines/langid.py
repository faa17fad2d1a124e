"""Trained character-n-gram language identification (Cavnar–Trenkle 1994,
"N-Gram-Based Text Categorization" — the public out-of-place rank-distance
method fastText-era lang-ID pipelines grew out of).

Upgrades `textops.lang_guess` (a fixed stopword heuristic) to a classifier
TRAINED from the corpus's own labeled rows — the shape a real pipeline
uses: fit profiles on a labeled slice, classify the crawl.

Shape:

1. **train** — one streaming pass emits per-batch PARTIAL (lang, gram,
   cnt) counts (grams = rolling-hash char 1..3-grams of the normalized
   text, `functions/shingle.shingle_batch` — gram identity is the 64-bit
   hash, exact and deterministic); a (lang, gram)-keyed groupby sums, and
   `stages/ranks.grouped_topk` takes the top ``n_profile`` grams per lang
   by (cnt desc, gram asc) with their rank — the profile table is
   langs × n rows, tiny by construction.
2. **classify** — profiles broadcast once via ``ray.put``; each batch
   builds its docs' own rank profiles in one lexsort (unique (doc, gram)
   counts → per-doc rank) and scores every language with the
   out-of-place distance: Σ over the doc's profile grams of
   |doc_rank − lang_rank|, missing grams costing ``n_profile``. All
   distances are exact int64; prediction = min distance, ties to the
   lexicographically smallest language; gramless docs predict "unknown".

Normalization: lower-case, non-LETTER runs (RE2 ``[^\\p{L}]+`` — any
script's letters survive) collapsed to one space, one space of padding
each side (the CT word-boundary convention). Byte-level grams over
UTF-8 — Cyrillic/CJK/Arabic/accented-Latin codepoints contribute their
multibyte byte n-grams, which is exactly how the original method
handles them; ASCII text normalizes identically to a plain [^a-z]+
rule, so Latin profiles match the earlier revision byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from fuzzy_matcher_ray.functions.shingle import counts_to_offsets, shingle_batch
from fuzzy_matcher_ray.pipelines.webtext import _as_array

N_PROFILE = 300
GRAM_LENS = (1, 2, 3)
_SEED = 0x1A9D


def _norm(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    s = pc.utf8_lower(pc.fill_null(_as_array(texts), ""))
    # collapse everything that is not a LETTER (any script — RE2 \p{L}):
    # whitespace / digits / punctuation fold to one space, but Cyrillic,
    # CJK, Arabic, accented-Latin codepoints survive and contribute their
    # UTF-8 byte n-grams. ASCII-only text normalizes identically to the
    # old [^a-z]+ rule (post-lowercase, every non-a-z ASCII char is a
    # non-letter), so Latin profiles are unchanged.
    s = pc.replace_substring_regex(s, r"[^\p{L}]+", " ")
    s = pc.utf8_trim_whitespace(s)
    # gramless marker for empty docs: padding would give ' ' grams
    return pc.if_else(pc.equal(s, ""), s,
                      pc.binary_join_element_wise(" ", s, " ", ""))


def _doc_grams(texts, gram_lens):
    """Concatenated (gram_hash, doc_of) over all gram lengths."""
    norm = _norm(texts)
    gs, ds = [], []
    for L in gram_lens:
        h, counts = shingle_batch(norm, L, seed=_SEED ^ L)
        gs.append(h.view(np.int64))
        ds.append(np.repeat(np.arange(len(counts)), counts))
    return np.concatenate(gs), np.concatenate(ds)


def _rank_rows(gram: np.ndarray, doc: np.ndarray, n_profile: int):
    """(doc, gram) multiset → per-doc CT rank rows (doc, gram, rank),
    rank = position under (cnt desc, gram asc) within the doc, < n_profile.
    One lexsort + segmented kernels — no per-doc dispatch."""
    if len(gram) == 0:
        e = np.empty(0, np.int64)
        return e, e, e
    # unique (doc, gram) with counts
    order = np.lexsort((gram, doc))
    d, g = doc[order], gram[order]
    new = np.empty(len(d), dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.append(starts, len(d)))
    du, gu = d[starts], g[starts]
    # rank within doc by (cnt desc, gram asc)
    order2 = np.lexsort((gu, -cnt, du))
    du, gu = du[order2], gu[order2]
    doc_new = np.empty(len(du), dtype=bool)
    doc_new[0] = True
    doc_new[1:] = du[1:] != du[:-1]
    seg_start = np.maximum.accumulate(
        np.where(doc_new, np.arange(len(du)), 0))
    rank = np.arange(len(du)) - seg_start
    keep = rank < n_profile
    return du[keep], gu[keep], rank[keep].astype(np.int64)


def _labeled_docs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])


def langid_profiles(sf_dir: str, n_profile: int = N_PROFILE,
                    gram_lens=GRAM_LENS):
    """(lang, gram, rank, cnt) — the trained per-language CT profiles."""
    from ray.data.aggregate import Sum

    from fuzzy_matcher_ray.stages.ranks import grouped_topk

    def _partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["lang"]))
        gram, doc = _doc_grams(t["text"], gram_lens)
        if len(gram) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "gram": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        lang_of = _as_array(t["lang"]).to_numpy(zero_copy_only=False)
        tb = pa.table({"lang": pa.array(lang_of[doc]),
                       "gram": pa.array(gram),
                       "cnt": pa.array(np.ones(len(gram), np.int64))})
        agg = tb.group_by(["lang", "gram"]).aggregate([("cnt", "sum")])
        return pa.table({"lang": agg["lang"], "gram": agg["gram"],
                         "cnt": pc.cast(agg["cnt_sum"], pa.int64())})

    counts = _labeled_docs(sf_dir) \
        .map_batches(_partial, batch_format="pyarrow") \
        .groupby(["lang", "gram"]).aggregate(Sum("cnt", alias_name="cnt"))
    # grouped_topk ranks by (value desc, id asc): id = NEGATED gram makes
    # the tie order gram DESC... keep gram ASC by using gram directly
    prof = grouped_topk(counts, "lang", "cnt", "gram", n_profile,
                        rank_col="rank")

    def _zero_base(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t["lang"], "gram": t["gram"],
                         "rank": pc.subtract(pc.cast(t["rank"], pa.int64()),
                                             pa.scalar(1, pa.int64())),
                         "cnt": t["cnt"]})

    return prof.map_batches(_zero_base, batch_format="pyarrow")


def _collect_profiles(prof_ds):
    """Profile Dataset → sorted-by-lang list of (lang, sorted grams,
    ranks-in-gram-order) for the broadcast classifier state."""
    parts = list(prof_ds.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"))
    out = []
    if parts:
        t = pa.concat_tables(parts)
        langs = sorted(set(t["lang"].to_pylist()))
        for lang in langs:
            sub = t.filter(pc.equal(t["lang"], lang))
            g = sub["gram"].to_numpy(zero_copy_only=False)
            r = sub["rank"].to_numpy(zero_copy_only=False)
            o = np.argsort(g)
            out.append((lang, g[o], r[o].astype(np.int64)))
    return out


def langid_classify(sf_dir: str, n_profile: int = N_PROFILE,
                    gram_lens=GRAM_LENS, profiles=None):
    """(doc_id, lang, lang_pred, dist) — every doc scored against the
    trained profiles (self-classification when ``profiles`` is None: fit
    on this corpus's labels, predict ignoring them — the standard
    open-set sanity report)."""
    if profiles is None:
        profiles = langid_profiles(sf_dir, n_profile, gram_lens)
    ref = ray.put(_collect_profiles(profiles))

    def _classify(t: pa.Table) -> pa.Table:
        profs = ray.get(ref)
        n_docs = t.num_rows
        gram, doc = _doc_grams(t["text"], gram_lens)
        du, gu, rank = _rank_rows(gram, doc, n_profile)
        pred = np.full(n_docs, "unknown", dtype=object)
        dist = np.zeros(n_docs, dtype=np.int64)
        if len(du) and profs:
            dists = np.empty((len(profs), n_docs), dtype=np.int64)
            for li, (lang, pg, prnk) in enumerate(profs):
                idx = np.searchsorted(pg, gu)
                idx_c = np.minimum(idx, max(len(pg) - 1, 0))
                found = (len(pg) > 0) & (pg[idx_c] == gu)
                oop = np.where(found, np.abs(rank - prnk[idx_c]),
                               n_profile)
                dists[li] = np.bincount(du, weights=oop,
                                        minlength=n_docs).astype(np.int64)
            has = np.zeros(n_docs, dtype=bool)
            has[du] = True
            best = np.argmin(dists, axis=0)      # first min = lex smallest
            pred[has] = np.array([profs[i][0] for i in best],
                                 dtype=object)[has]
            dist = np.where(has, dists[best, np.arange(n_docs)], 0)
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "lang_pred": pa.array(pred, pa.string()),
                         "dist": pa.array(dist, pa.int64())})

    return _labeled_docs(sf_dir) \
        .map_batches(_classify, batch_format="pyarrow").sort("doc_id")


def langid_report(sf_dir: str, n_profile: int = N_PROFILE,
                  gram_lens=GRAM_LENS):
    """(lang, lang_pred, n_docs) confusion counts of the
    self-classification — the corpus-health view a curation run reads."""
    from ray.data.aggregate import Count
    out = langid_classify(sf_dir, n_profile, gram_lens)
    return out.groupby(["lang", "lang_pred"]) \
        .aggregate(Count(alias_name="n_docs")).sort(["lang", "lang_pred"])
