"""Semantic tests for the frequency-boilerplate and fuzzy-contamination ops.

The exact-value oracles live in test_entry_contract (DuckDB hash parity) and
test_null_text_parity; these tests pin the SEMANTICS on hand-built corpora:
boilerplate drops every occurrence (vs dedup_spans' keep-first), and a light
paraphrase of an eval doc scores high where exact positional grams miss it.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from fuzzy_matcher_ray.pipelines.webtext import (dedup_spans,
                                                 drop_boilerplate,
                                                 neardup_contamination)


def _mk_docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


BANNER = "accept all cookies to continue"
BODY = ["gamma rays traverse the detector array",
        "the calibration run finished overnight",
        "beam current held steady through the fill"]


def test_drop_boilerplate_drops_every_occurrence(ray_session):
    texts = [f"{BANNER}\n{BODY[i]}" for i in range(3)] + [BODY[0]]
    out = drop_boilerplate(_mk_docs(texts), span_tokens=None, pattern="\n",
                           min_docs=3).sort("doc_id").take_all()
    got = {r["doc_id"]: r["kept_text"] for r in out}
    # the banner appears in 3 distinct docs -> removed from ALL of them,
    # including the first occurrence (unlike dedup_spans)
    assert got == {0: BODY[0], 1: BODY[1], 2: BODY[2], 3: BODY[0]}


def test_drop_boilerplate_vs_dedup_spans(ray_session):
    texts = [f"{BANNER}\n{BODY[i]}" for i in range(3)]
    first = {r["doc_id"]: r["kept_text"] for r in dedup_spans(
        _mk_docs(texts), span_tokens=None, pattern="\n").take_all()}
    # keep-first retains the banner in doc 0; drop-frequent removes it there
    assert first[0] == texts[0]
    dropped = {r["doc_id"]: r["kept_text"] for r in drop_boilerplate(
        _mk_docs(texts), span_tokens=None, pattern="\n",
        min_docs=3).take_all()}
    assert dropped[0] == BODY[0]


def test_drop_boilerplate_below_threshold_keeps_all(ray_session):
    texts = [f"{BANNER}\n{BODY[i]}" for i in range(2)]
    out = {r["doc_id"]: r["kept_text"] for r in drop_boilerplate(
        _mk_docs(texts), span_tokens=None, pattern="\n",
        min_docs=3).take_all()}
    assert out == {0: texts[0], 1: texts[1]}


def test_drop_boilerplate_pure_boilerplate_doc_drops(ray_session):
    texts = [BANNER, BANNER, BANNER, BODY[0]]
    out = {r["doc_id"]: r["kept_text"] for r in drop_boilerplate(
        _mk_docs(texts), span_tokens=None, pattern="\n",
        min_docs=3).take_all()}
    assert out == {3: BODY[0]}


@pytest.fixture()
def contam_sf(tmp_path):
    # doc 0 is the eval doc; doc 20 paraphrases it with one word changed,
    # doc 21 shares nothing. Interleave unrelated eval docs 1..19.
    rng = np.random.default_rng(7)
    vocab = ["neutron", "flux", "moderator", "cladding", "reflector",
             "coolant", "turbine", "condenser"]
    eval_doc = ("the quick brown fox jumps over the lazy dog while the "
                "band plays on")
    texts = [eval_doc] + [
        " ".join(rng.choice(vocab, 12)) for _ in range(19)]
    texts += [eval_doc.replace("fox", "cat"),
              "completely unrelated content about tokamak divertors"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_neardup_contamination_flags_paraphrase(ray_session, contam_sf):
    out = {r["doc_id"]: r["max_jacc_pm"]
           for r in neardup_contamination(contam_sf).take_all()}
    assert set(out) == {20, 21}
    # one changed word in ~15 -> high but sub-1000 Jaccard
    assert 500 < out[20] < 1000
    # no shared normalized 5-grams with any eval doc
    assert out[21] < 100
    assert out[20] > out[21]


def test_neardup_contamination_exact_copy_scores_1000(ray_session, tmp_path):
    texts = ["shared exact evaluation answer text here"] + \
        ["filler"] * 19 + ["shared exact evaluation answer text here"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r["max_jacc_pm"]
           for r in neardup_contamination(str(tmp_path)).take_all()}
    assert out[20] == 1000
