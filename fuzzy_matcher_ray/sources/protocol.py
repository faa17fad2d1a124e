"""Source protocol: adapt any Parquet table to the canonical doc shape.

≙ ``FuzzyMatcherDataSource`` (``/root/reference/fuzzy_types/types.go:102-105``
— CreateFuzzyEntry + GetSearchParameters): a source is a function that turns a
table path into a Dataset with the canonical columns

    doc_id:int64, url:string, text:string, lang:string [, valid_until:ts]

Column pruning happens at the read (``read_parquet(columns=...)``) so unused
payload never leaves storage — ≙ BenchmarkSource indexing only 3 of 15
columns (benchmark_source.go:82-91).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def documents_source(sf_dir: str):
    """Driver testdata ``documents`` table → canonical docs."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def _adapt(t: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            pa.array(["doc://"] * len(t)),
            pc.cast(t["doc_id"], pa.string()), "")
        return pa.table({"doc_id": t["doc_id"], "url": url,
                         "text": t["text"], "lang": t["lang"]})

    return ds.map_batches(_adapt, batch_format="pyarrow")


def webpages_source(path: str, extract_html: bool = False):
    """Common-Crawl-style table (url, warc_ts, html, text, lang) → canonical.

    Default mode prunes the wide ``html`` binary column AT THE READ — it
    never enters the pipeline (extraction already ran upstream).
    ``extract_html=True`` runs the real extraction stage instead: read
    (url, warc_ts, html, lang), derive ``text`` via the ``HtmlExtractor``
    actor pool, and drop ``html`` immediately after. The two modes produce
    byte-identical docs (the input_hint invariant), asserted by
    tests/test_html_extract.py.
    """
    if extract_html:
        from fuzzy_matcher_ray.stages.extract_stage import extract_pages
        ds = rd.read_parquet(path, columns=["url", "warc_ts", "html", "lang"])
        ds = extract_pages(ds)
    else:
        ds = rd.read_parquet(path, columns=["url", "warc_ts", "text", "lang"])

    def _adapt(t: pa.Table) -> pa.Table:
        from fuzzy_matcher_ray.functions.fingerprint import content_hash
        # stable surrogate id = 63-bit hash of url (sign-safe int64)
        h = content_hash(t["url"].combine_chunks()
                         if isinstance(t["url"], pa.ChunkedArray) else t["url"])
        doc_id = pa.array((h >> 1).astype("int64"))
        return pa.table({"doc_id": doc_id, "url": t["url"], "text": t["text"],
                         "lang": t["lang"], "warc_ts": t["warc_ts"]})

    return ds.map_batches(_adapt, batch_format="pyarrow")


def _canonical_adapt(ds):
    """Any (text [, url, lang]) Dataset → canonical docs: missing lang
    becomes "und"; missing url gets a content-addressed surrogate SALTED
    with the row's global read-order position (``content://{hash}/{pos}``)
    so distinct input rows with identical — or both-null — text keep
    DISTINCT doc_ids: downstream contracts (cluster row counts, groupby
    cardinalities) see exactly as many docs as the source had, and exact-
    content collapsing stays where it belongs, in the dedup operators.
    doc_id is the 63-bit url hash (the same surrogate rule as
    webpages_source, so identical (url, text) rows get identical ids
    across source formats). The position comes from the shared block-
    metadata prefix-sum stamp (O(blocks) driver ints, one remote stamp per
    block) and is deterministic for a given input file list, since Ray
    Datasets preserve read order."""
    from fuzzy_matcher_ray.functions.fingerprint import content_hash

    names = set(ds.schema().names)
    if "url" not in names:
        from fuzzy_matcher_ray.stages.ranks import stamp_global_positions
        ds = stamp_global_positions(ds, col="_src_pos")

    def _adapt(t: pa.Table) -> pa.Table:
        names = set(t.column_names)
        text = pc.cast(t["text"], pa.string()) if "text" in names else \
            pa.nulls(t.num_rows, pa.string())
        if "url" in names:
            url = pc.cast(t["url"], pa.string())
        else:
            th = content_hash(pc.fill_null(text, "").combine_chunks()
                              if isinstance(text, pa.ChunkedArray) else
                              pc.fill_null(text, ""))
            url = pc.binary_join_element_wise(
                pa.array(["content://"] * t.num_rows),
                pc.cast(pa.array(th.astype("int64")), pa.string()),
                pa.array(["/"] * t.num_rows),
                pc.cast(t["_src_pos"], pa.string()), "")
        lang = (pc.cast(t["lang"], pa.string()) if "lang" in names
                else pa.array(["und"] * t.num_rows, pa.string()))
        u = url.combine_chunks() if isinstance(url, pa.ChunkedArray) else url
        doc_id = pa.array((content_hash(u) >> 1).astype("int64"))
        return pa.table({"doc_id": doc_id, "url": url,
                         "text": text, "lang": lang})

    return ds.map_batches(_adapt, batch_format="pyarrow")


def jsonl_source(path: str):
    """JSON-lines corpus → canonical docs (the wire format CC-derived text
    dumps and the reference's own test corpora use —
    tests/example_members_test.go:50-64 reads JSON; Ray's streaming JSON
    reader shards files exactly like the parquet path)."""
    return _canonical_adapt(rd.read_json(path))


def csv_source(path: str):
    """CSV corpus → canonical docs (same adaptation; header row defines
    the columns, ``text`` required, ``url``/``lang`` optional)."""
    return _canonical_adapt(rd.read_csv(path))
