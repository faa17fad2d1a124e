"""Regression tests for the round-4 advisor findings (ADVICE.md r4):

1. PageRank's fixed-point contribution kernel must stay exact when a hub's
   rank exceeds ~1.08e13 units (the naive d·rank product wraps int64).
2. langid must classify non-Latin-script documents (Cyrillic/CJK), not
   normalize them to empty → "unknown".
3. text_embeddings_artifact must key its cache on corpus CONTENT, not the
   directory path — regenerating a corpus in place must not serve stale
   embeddings.
4. hamming_dup_pairs must not explode O(n²) candidate pairs for degenerate
   perceptual hashes (blank images / silent audio): exact-hash groups above
   a threshold collapse to star pairs, cluster-completeness preserved.
5. url-less sources must keep distinct doc_ids for identical-text rows
   (position-salted surrogate) — covered in test_sources.py; the null-text
   twin is covered here.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# 1. PageRank hub-rank overflow
# ---------------------------------------------------------------------------

def test_pagerank_contrib_exact_at_hub_scale():
    from fuzzy_matcher_ray.pipelines.graph import PPM, _contrib_of
    d = 850_000
    rank = np.array([1, PPM, 10**13, 2**62, 2**63 - 1, 7 * 10**15 + 3],
                    dtype=np.int64)
    outdeg = np.array([1, 3, 7, 1000, 1, 12345], dtype=np.int64)
    got = _contrib_of(rank, outdeg, d)
    # oracle: Python arbitrary-precision integers
    exp = np.array([(d * int(r)) // (PPM * int(o))
                    for r, o in zip(rank, outdeg)], dtype=np.int64)
    assert (got == exp).all()
    # the naive kernel provably wraps on these inputs — prove the test bites
    with np.errstate(over="ignore"):
        naive = (d * rank) // (PPM * outdeg)
    assert not (naive == exp).all()


def test_pagerank_contrib_matches_naive_in_safe_regime():
    """Below the overflow bound the decomposed kernel is byte-identical to
    the original formula — existing driver/distributed parity holds."""
    from fuzzy_matcher_ray.pipelines.graph import PPM, _contrib_of
    rng = np.random.RandomState(7)
    rank = rng.randint(1, 10**12, size=1000).astype(np.int64)
    outdeg = rng.randint(1, 10**4, size=1000).astype(np.int64)
    for d in (850_000, 999_999, 1):
        assert (_contrib_of(rank, outdeg, d)
                == (d * rank) // (PPM * outdeg)).all()


# ---------------------------------------------------------------------------
# 2. langid on non-Latin scripts
# ---------------------------------------------------------------------------

_RU = ["привет мир как дела сегодня хорошо",
       "это русский текст про погоду и природу",
       "москва большой город на реке",
       "книги читать полезно каждый день"]
_EN = ["hello world how are things today",
       "this english text talks about weather",
       "london is a big city on a river",
       "reading books is useful every day"]
_ZH = ["今天 天气 很好 我们 去 公园",
       "这是 一段 中文 文字 关于 天气",
       "北京 是 一个 大 城市",
       "每天 读书 对 人 有 好处"]


def _langid_fixture(tmp_path):
    texts, langs = [], []
    for t in _RU:
        texts.append(t); langs.append("ru")
    for t in _EN:
        texts.append(t); langs.append("en")
    for t in _ZH:
        texts.append(t); langs.append("zh")
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_langid_norm_keeps_non_latin_letters():
    from fuzzy_matcher_ray.pipelines.langid import _norm
    out = _norm(pa.array(["Привет, мир 123!", "中文 测试 9", "ABC def!"])) \
        .to_pylist()
    assert out[0] == " привет мир "
    assert out[1] == " 中文 测试 "
    assert out[2] == " abc def "          # ASCII identical to the old rule


def test_langid_classifies_cyrillic_and_cjk(ray_session, tmp_path):
    from fuzzy_matcher_ray.pipelines.langid import langid_classify
    sf = _langid_fixture(tmp_path)
    out = langid_classify(sf, n_profile=200).to_pandas()
    assert (out.lang_pred != "unknown").all()
    # self-classification on clearly-separated scripts must be exact
    assert (out.lang_pred == out.lang).all()


# ---------------------------------------------------------------------------
# 3. embeddings artifact cache keyed on content
# ---------------------------------------------------------------------------

def _write_docs(path, texts):
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    pq.write_table(tbl, str(path / "documents.parquet"))


def test_embed_artifact_invalidates_on_corpus_change(ray_session, tmp_path):
    import os

    from fuzzy_matcher_ray.pipelines.embed import text_embeddings_artifact
    _write_docs(tmp_path, ["alpha beta", "gamma delta"])
    d1 = text_embeddings_artifact(str(tmp_path), dim=16)
    t1 = pq.read_table(os.path.join(d1, "embeddings.parquet"))
    # regenerate the corpus AT THE SAME PATH with different content
    _write_docs(tmp_path, ["epsilon zeta", "eta theta", "iota kappa"])
    os.utime(str(tmp_path / "documents.parquet"))  # force mtime tick
    d2 = text_embeddings_artifact(str(tmp_path), dim=16)
    assert d2 != d1                       # new content → new cache key
    t2 = pq.read_table(os.path.join(d2, "embeddings.parquet"))
    assert t2.num_rows == 3 and t1.num_rows == 2
    # idempotent for unchanged content
    assert text_embeddings_artifact(str(tmp_path), dim=16) == d2
    # completed artifacts always carry the marker
    assert os.path.exists(os.path.join(d2, "_DONE"))


# ---------------------------------------------------------------------------
# 4. degenerate perceptual-hash groups
# ---------------------------------------------------------------------------

def _hashed_ds(pairs):
    import ray.data as rd
    ids = [p[0] for p in pairs]
    hs = [p[1] for p in pairs]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "h": pa.array(hs, pa.int64()),
    }))


def test_hamming_degenerate_group_collapses_to_star(ray_session):
    from fuzzy_matcher_ray.pipelines.multimodal import hamming_dup_pairs
    rows = [(i, 0) for i in range(200)]            # 200 blank-image hashes
    far = 0x00F0_F0F0_F0F0_F0F0                    # popcount 28 ≫ 3 from 0
    rows += [(300, far), (301, far | 1)]            # a true ≤3-bit pair
    rows += [(400, -(2**62) + 12345)]               # unrelated singleton
    got = {(r["a"], r["b"]) for r in
           hamming_dup_pairs(_hashed_ds(rows), "h", max_hamming=3,
                             degenerate_group_max=64).take_all()}
    star = {(0, b) for b in range(1, 200)}
    assert star <= got                              # star pairs emitted
    assert (300, 301) in got                        # banding path intact
    assert not any(a == 400 or b == 400 for a, b in got)
    # no O(n²) explode: within-group pairs are star-only above threshold
    assert len(got) == len(star) + 1


def test_hamming_degenerate_rep_still_bands_externally(ray_session):
    """Cluster-completeness: the rep carries the group's band edges, so a
    doc within Hamming ≤3 of the degenerate hash still links the group."""
    from fuzzy_matcher_ray.pipelines.multimodal import hamming_dup_pairs
    rows = [(i, 1 << 33) for i in range(100)]       # degenerate value
    rows += [(500, (1 << 33) | 1)]                  # 1 bit away from it
    got = {(r["a"], r["b"]) for r in
           hamming_dup_pairs(_hashed_ds(rows), "h", max_hamming=3,
                             degenerate_group_max=64).take_all()}
    assert (0, 500) in got                          # rep ↔ outsider edge
    assert {(0, b) for b in range(1, 100)} <= got


def test_hamming_small_exact_groups_keep_all_pairs(ray_session):
    """Below the threshold the output is unchanged: full all-pairs."""
    from fuzzy_matcher_ray.pipelines.multimodal import hamming_dup_pairs
    rows = [(0, 77), (1, 77), (2, 77)]
    got = {(r["a"], r["b"]) for r in
           hamming_dup_pairs(_hashed_ds(rows), "h", max_hamming=3,
                             degenerate_group_max=64).take_all()}
    assert got == {(0, 1), (0, 2), (1, 2)}


# ---------------------------------------------------------------------------
# 5. url-less null-text rows keep distinct ids
# ---------------------------------------------------------------------------

def test_null_text_urlless_rows_keep_distinct_ids(ray_session, tmp_path):
    import json

    from fuzzy_matcher_ray.sources.protocol import jsonl_source
    p = tmp_path / "nulls.jsonl"
    p.write_text("\n".join(json.dumps({"text": None}) for _ in range(4))
                 + "\n")
    out = jsonl_source(str(p)).take_all()
    assert len({r["doc_id"] for r in out}) == 4
