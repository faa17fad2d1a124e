"""Deterministic synthetic Common-Crawl-style corpus with planted duplicates.

Implements FIXTURES.md F1: table (url, warc_ts, html, text, lang) + ground
truth sidecar (url, true_cluster_id). Fully seeded — same params ⇒ identical
bytes, across processes and parallelism levels. Variant kinds mirror the
reference's golden corpora:

- exact copies                    (≙ terminal-node ID dedup)
- token substitutions/deletions   (≙ fuzzy typo cases, fuzzy_search_cases.json)
- OCR confusable corruption       (≙ recurse.go:7-41 tables, ocr tests)
- prefix/containment              (≙ nickname completion, nickname_tests.json)
- long shared substring           (suffix-array stage target)
- degenerate: empty/short/non-en  (≙ short-name exact tier,
                                   short_name_validation_tests.json)
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_VOCAB = np.array([
    "data", "query", "table", "scan", "merge", "sort", "hash", "join", "index",
    "batch", "stream", "page", "cache", "block", "shard", "node", "actor",
    "store", "write", "read", "filter", "group", "limit", "order", "count",
    "value", "key", "row", "column", "vector", "text", "token", "shingle",
    "band", "cluster", "signature", "window", "bucket", "sample", "spill",
    "report", "metric", "result", "engine", "worker", "driver", "object",
], dtype=object)

_OCR_SUBS = [("m", "rn"), ("nn", "m"), ("o", "0"), ("l", "1"), ("s", "5"),
             ("e", "3"), ("a", "4"), ("w", "vv")]

KIND_UNIQUE = "unique"
KIND_EXACT = "exact"
KIND_NEAR = "near"
KIND_OCR = "ocr"
KIND_PREFIX = "prefix"
KIND_SUBSTR = "substr"
KIND_DEGEN = "degen"


def _base_doc(rng: np.random.Generator, lo=50, hi=400) -> str:
    n = int(rng.integers(lo, hi))
    return " ".join(rng.choice(_VOCAB, n))


def _near_variant(rng: np.random.Generator, base: str, frac: float) -> str:
    toks = base.split(" ")
    n_mut = max(1, int(len(toks) * frac))
    idx = rng.choice(len(toks), size=min(n_mut, len(toks)), replace=False)
    for i in idx:
        if rng.random() < 0.5:
            toks[i] = str(rng.choice(_VOCAB))
        else:
            toks[i] = ""
    return " ".join(t for t in toks if t)


def _ocr_variant(rng: np.random.Generator, base: str, n_sub: int = 4) -> str:
    s = base
    for _ in range(n_sub):
        src, dst = _OCR_SUBS[int(rng.integers(0, len(_OCR_SUBS)))]
        pos = s.find(src, int(rng.integers(0, max(1, len(s) - 10))))
        if pos >= 0:
            s = s[:pos] + dst + s[pos + len(src):]
    return s


def encode_html(text: str, idx: int) -> bytes:
    """Render ``text`` into a realistic full page (the F1 ``html`` column).

    The inverse of ``functions/html.extract_text_column`` — every byte of
    ``text`` round-trips: head/title/style/script, nav + footer boilerplate,
    comments and tag attributes are dropped by extraction; inline markup
    (<b>/<i>/<a>) wraps whole tokens; ~30% of pages encode some characters
    as numeric entities (``&#100;`` / ``&#x64;``) that decode back to the
    original byte. Per-row determinism comes from crc32(text)+idx, NOT the
    corpus rng stream, so adding this encoder never shifts planted clusters.
    """
    r = np.random.default_rng(zlib.crc32(text.encode()) + 7919 * idx + 1)
    toks = text.split(" ") if text else []
    use_entities = r.random() < 0.30

    def render(w: str) -> str:
        if use_entities and w and r.random() < 0.03:
            j = int(r.integers(0, len(w)))
            o = ord(w[j])
            rep = f"&#{o};" if r.random() < 0.5 else f"&#x{o:x};"
            w = w[:j] + rep + w[j + 1:]
        v = r.random()
        if v < 0.04:
            return f"<b>{w}</b>"
        if v < 0.07:
            return f"<i>{w}</i>"
        if v < 0.09:
            return f'<a href="/l/{int(r.integers(0, 999))}">{w}</a>'
        return w

    paras = []
    i = 0
    while i < len(toks):
        n = int(r.integers(20, 61))
        paras.append("<p>" + " ".join(render(w) for w in toks[i:i + n])
                     + "</p>")
        i += n
    title = " ".join(toks[:4]) or "untitled"
    body = "\n".join(paras)
    page = (
        "<!DOCTYPE html>\n"
        f"<html lang=\"en\">\n<head>\n<title>{title}</title>\n"
        "<meta charset=\"utf-8\">\n"
        "<style>body { margin: 0; font: 14px serif; }</style>\n"
        f"<script>var pageId = {idx}; track(pageId);</script>\n"
        "</head>\n<body>\n"
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>\n"
        f"<!-- page {idx} rendered by synthcrawl -->\n"
        f"{body}\n"
        "<footer>&copy; 2024 synthcrawl &middot; all rights reserved"
        "</footer>\n</body>\n</html>\n")
    return page.encode()


def make_webpages(n_docs: int, seed: int = 42,
                  near_frac: float = 0.04) -> tuple[pa.Table, pa.Table]:
    """Build (pages_table, truth_table).

    ~55% unique, ~35% planted duplicate-cluster members (sizes 2-8, mixed
    variant kinds), ~10% degenerate. ``true_cluster_id`` = base doc index for
    variants whose kind is expected to be caught (exact/near/ocr/substr);
    prefix/containment variants get their own truth id unless the prefix is
    nearly the whole doc (Jaccard-style dedup is not containment dedup — the
    substring pass links them only when the shared run ≥ substr_min_len).
    """
    rng = np.random.default_rng(seed)
    urls, texts, langs, kinds, truth = [], [], [], [], []
    i = 0
    cluster_id = 0
    while i < n_docs:
        r = rng.random()
        if r < 0.10:  # degenerate
            kind = KIND_DEGEN
            choice = rng.random()
            if choice < 0.33:
                txt = ""
            elif choice < 0.66:
                txt = str(rng.choice(_VOCAB))
            else:
                txt = _base_doc(rng, 50, 120)
            lang = "de" if choice >= 0.66 else "en"
            urls.append(f"https://site{i % 97}.example/page/{i}")
            texts.append(txt)
            langs.append(lang)
            kinds.append(kind)
            truth.append(-1 if txt == "" else cluster_id)
            cluster_id += 1
            i += 1
        elif r < 0.45:  # planted cluster
            base = _base_doc(rng)
            size = int(rng.integers(2, 9))
            members = [base]
            member_kinds = [KIND_UNIQUE]
            for _ in range(size - 1):
                v = rng.random()
                if v < 0.30:
                    members.append(base)
                    member_kinds.append(KIND_EXACT)
                elif v < 0.65:
                    members.append(_near_variant(rng, base, near_frac))
                    member_kinds.append(KIND_NEAR)
                elif v < 0.85:
                    members.append(_ocr_variant(rng, base))
                    member_kinds.append(KIND_OCR)
                else:
                    extra = _base_doc(rng, 10, 40)
                    members.append(base + " " + extra)
                    member_kinds.append(KIND_SUBSTR)
            for m, k in zip(members, member_kinds):
                if i >= n_docs:
                    break
                urls.append(f"https://site{i % 97}.example/page/{i}")
                texts.append(m)
                langs.append("en")
                kinds.append(k)
                truth.append(cluster_id)
                i += 1
            cluster_id += 1
        else:  # unique
            urls.append(f"https://site{i % 97}.example/page/{i}")
            texts.append(_base_doc(rng))
            langs.append("en")
            kinds.append(KIND_UNIQUE)
            truth.append(cluster_id)
            cluster_id += 1
            i += 1

    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base_ts + np.arange(len(urls)) * np.timedelta64(1000000, "us")
    html = pa.array([encode_html(t, i) for i, t in enumerate(texts)],
                    pa.binary())
    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts),
        "html": html,
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    truth_tbl = pa.table({
        "url": pa.array(urls, pa.string()),
        "true_cluster_id": pa.array(truth, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
    })
    return pages, truth_tbl


# Generator version: part of every cached fixture filename. BUMP THIS when
# make_webpages/encode_html change output for the same (n_docs, seed) —
# otherwise a stale /tmp fixture from a pre-change build is silently reused
# (e.g. the html column's byte-identical proof would read false).
_GEN_VERSION = 2


def write_webpages(out_dir: str, n_docs: int, seed: int = 42) -> str:
    """Materialize the corpus as parquet; returns the pages path. Cached —
    rewrites only if missing (deterministic per generator version, which is
    baked into the filename, so any existing copy is valid)."""
    import os

    import pyarrow.parquet as pq
    pages_path = os.path.join(
        out_dir, f"pages-v{_GEN_VERSION}-{n_docs}-{seed}.parquet")
    truth_path = os.path.join(
        out_dir, f"truth-v{_GEN_VERSION}-{n_docs}-{seed}.parquet")
    if not (os.path.exists(pages_path) and os.path.exists(truth_path)):
        os.makedirs(out_dir, exist_ok=True)
        pages, truth = make_webpages(n_docs, seed)
        pq.write_table(pages, pages_path)
        pq.write_table(truth, truth_path)
    return pages_path
