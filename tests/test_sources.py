"""JSONL / CSV ingestion sources: canonical adaptation + pipeline compat."""

import json

import pyarrow as pa
import pytest


@pytest.fixture()
def jsonl_corpus(tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [{"text": "alpha beta gamma delta", "url": "https://x.example/0",
             "lang": "en"},
            {"text": "alpha beta gamma delta", "url": "https://x.example/1",
             "lang": "en"},
            {"text": "totally different words here", "url":
             "https://x.example/2", "lang": "de"}]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p), rows


def test_jsonl_source_canonical(ray_session, jsonl_corpus):
    from fuzzy_matcher_ray.sources.protocol import jsonl_source
    path, rows = jsonl_corpus
    out = sorted(jsonl_source(path).take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in out] == [r["url"] for r in rows]
    assert [r["text"] for r in out] == [r["text"] for r in rows]
    assert [r["lang"] for r in out] == ["en", "en", "de"]
    assert len({r["doc_id"] for r in out}) == 3          # distinct urls


def test_csv_source_defaults_and_content_ids(ray_session, tmp_path):
    from fuzzy_matcher_ray.sources.protocol import csv_source
    p = tmp_path / "docs.csv"
    p.write_text("text\nfoo bar\nfoo bar\nother\n")
    out = csv_source(str(p)).take_all()
    assert [r["lang"] for r in out] == ["und"] * 3
    # position-salted surrogate: identical text rows keep DISTINCT ids
    # (exact-content collapsing is the dedup operators' job, not ingest's)
    ids = [r["doc_id"] for r in out]
    assert len(set(ids)) == 3
    assert all(r["url"].startswith("content://") for r in out)
    # deterministic: a second read of the same file gives the same ids
    again = [r["doc_id"] for r in csv_source(str(p)).take_all()]
    assert sorted(again) == sorted(ids)
    # the shared-content rows still share the content prefix of the url
    pre = [r["url"].rsplit("/", 1)[0] for r in out]
    assert pre[0] == pre[1] != pre[2]


def test_jsonl_source_feeds_dedup(ray_session, jsonl_corpus):
    """The canonical adaptation is pipeline-compatible end-to-end."""
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    from fuzzy_matcher_ray.sources.protocol import jsonl_source
    path, _ = jsonl_corpus
    out = find_duplicates(jsonl_source(path), PipelineConfig()).to_pandas()
    assert len(out) == 3
    assert out.cluster_id.nunique() == 2                # exact pair merged


def test_source_id_parity_across_formats(ray_session, tmp_path,
                                          jsonl_corpus):
    """Same (url, text) rows through JSONL and CSV get IDENTICAL ids —
    the surrogate rule is format-independent."""
    from fuzzy_matcher_ray.sources.protocol import csv_source, jsonl_source
    jpath, rows = jsonl_corpus
    p = tmp_path / "same.csv"
    p.write_text("url,text,lang\n" + "\n".join(
        f"{r['url']},{r['text']},{r['lang']}" for r in rows) + "\n")
    a = {r["url"]: r["doc_id"] for r in jsonl_source(jpath).take_all()}
    b = {r["url"]: r["doc_id"] for r in csv_source(str(p)).take_all()}
    assert a == b
