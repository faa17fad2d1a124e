"""HTML → text extraction: the input_hint's byte-identical-per-url invariant.

The generator (sources/webpages.encode_html) renders each document's full
text into a realistic page; the extractor (functions/html) must recover it
byte-for-byte for EVERY row — including degenerate empty/short docs and
pages with numeric character entities.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fuzzy_matcher_ray.functions.html import extract_text, extract_text_column
from fuzzy_matcher_ray.sources.webpages import make_webpages


# --- kernel unit cases -------------------------------------------------

CASES = [
    ("<p>hello world</p>", "hello world"),
    ("<!DOCTYPE html><html><body><p>a b</p></body></html>", "a b"),
    ("<p>a</p>\n<p>b</p>", "a b"),                       # block boundary
    ("<p>a <b>bold</b> c</p>", "a bold c"),              # inline markup
    ("<p>a <a href=\"/x?y=1\">link</a> b</p>", "a link b"),
    ("<script>var x = '<p>no</p>';</script><p>yes</p>", "yes"),
    ("<style>p { color: red; }</style><p>t</p>", "t"),
    ("<head><title>drop me</title></head><p>keep</p>", "keep"),
    ("<nav>Home About</nav><p>body</p><footer>c</footer>", "body"),
    ("<!-- secret --><p>shown</p>", "shown"),
    ("<p>&#104;i</p>", "hi"),                            # decimal entity
    ("<p>&#x68;i</p>", "hi"),                            # hex entity
    ("<p>a&amp;b</p>", "a&b"),                           # named entity
    ("<p>  spaced   out  </p>", "spaced out"),           # ws collapse
    ("", ""),
    ("<html><head></head><body></body></html>", ""),
    ("<SCRIPT>x</SCRIPT><P>case</P>", "case"),           # case-insensitive
]


@pytest.mark.parametrize("html,want", CASES)
def test_kernel_cases(html, want):
    assert extract_text(html) == want
    assert extract_text(html.encode()) == want


def test_kernel_column_matches_scalar_and_null():
    htmls = [c[0].encode() for c in CASES] + [None]
    col = extract_text_column(pa.array(htmls, pa.binary()))
    got = col.to_pylist()
    assert got[:-1] == [c[1] for c in CASES]
    assert got[-1] is None  # null html stays null


# --- generator round-trip: the invariant itself ------------------------

def test_byte_identical_roundtrip():
    pages, _ = make_webpages(800, seed=11)
    texts = pages["text"].to_pylist()
    got = extract_text_column(pages["html"]).to_pylist()
    assert got == texts  # byte-identical, every row

    htmls = pages["html"].to_pylist()
    # the corpus actually exercises the hard parts — guard against the
    # generator regressing to trivial markup
    assert all(b"<script>" in h for h in htmls)
    assert all(b"<footer>" in h for h in htmls)
    assert sum(1 for h in htmls if b"&#" in h) > 50      # entity pages
    assert sum(1 for h in htmls if b"<b>" in h) > 100    # inline markup
    assert any(t == "" for t in texts)                   # degenerate rows


def test_generator_deterministic():
    a, _ = make_webpages(60, seed=5)
    b, _ = make_webpages(60, seed=5)
    assert a.equals(b)


# --- Ray e2e: extraction mode ≡ pre-extracted mode ---------------------

def test_source_extract_mode_identical(ray_session, tmp_path):
    from fuzzy_matcher_ray.sources.protocol import webpages_source

    pages, _ = make_webpages(300, seed=23)
    path = os.path.join(tmp_path, "pages.parquet")
    pq.write_table(pages, path)

    pre = webpages_source(path).to_pandas().sort_values("url")
    ext = webpages_source(path, extract_html=True) \
        .to_pandas().sort_values("url")
    cols = ["doc_id", "url", "text", "lang"]
    assert pre[cols].reset_index(drop=True) \
        .equals(ext[cols].reset_index(drop=True))
    assert "html" not in ext.columns  # wide column dropped in-stage
