"""Web-text sub-document dedup: the corpus-level exact span/line tier.

Production web pipelines (C4, RefinedWeb) run an exact sub-document dedup
tier BEFORE fuzzy dedup: every repeated line (or fixed-width token span) is
dropped except its first global occurrence, and documents are rebuilt from
the survivors. This generalizes the reference's whole-entry exact-key dedup
(fuzzy_matcher_core.go Insert path) to sub-document granularity.

Ray-Data shape (all stages stream):

1. explode — ``map_batches`` splits each doc into spans with a fully
   vectorized Arrow kernel (``split_pattern`` → offset arithmetic →
   ``ListArray.from_arrays`` → ``binary_join``); emits
   ``(doc_id, ln, line, pack)`` rows where ``pack = doc_id·2^32 + ln`` is
   the lexicographic (doc_id, ln) order key packed into one int64.
2. winner — ``groupby(line).aggregate(Min(pack))``: one hash-partitioned
   shuffle keyed by span content. At web scale the key would be the span's
   64/128-bit content hash (cf. pipelines/dedup.py exact pass) so only
   fixed-width keys move; raw strings are kept here for exact SQL parity.
3. keep — join the winner pack back onto the exploded rows
   (broadcast-or-shuffle via ``attach_columns``) and keep rows whose own
   pack equals the winner pack (the first global occurrence).
4. rebuild — ``groupby(doc_id).map_groups`` re-joins each doc's surviving
   spans in ``ln`` order. Output-proportional (one small string join per
   surviving doc); docs that lose every span (exact full dups) drop out.

Scale assumptions (documented per the custom-operator rule): doc_id < 2^31
and spans-per-doc < 2^32 for the pack key; span strings are bounded by
``span_tokens`` · max-token-length so no single group in the winner shuffle
exceeds a block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from fuzzy_matcher_ray.stages.joins import attach_columns


def _as_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


class SpanExploder:
    """Vectorized doc → span rows. ``span_tokens`` mode chunks the
    whitespace token stream into non-overlapping windows of that many
    tokens (C4-style span); ``pattern`` mode (span_tokens=None) treats each
    ``pattern``-delimited line as a span (RefinedWeb-style line dedup)."""

    def __init__(self, span_tokens: int | None = 10, pattern: str = "\n"):
        self.span_tokens = span_tokens
        self.pattern = pattern
        self.joiner = " " if span_tokens is not None else pattern

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = _as_array(t["doc_id"]).to_numpy(zero_copy_only=False)
        text = pc.fill_null(_as_array(t["text"]), "")
        if self.span_tokens is not None:
            toks = pc.split_pattern(text, " ")
            offs = toks.offsets.to_numpy(zero_copy_only=False)
            n = np.diff(offs)                           # tokens per doc
            w = self.span_tokens
            nspans = -(-n // w)                         # ceil; 0 only if n==0
            total = int(nspans.sum())
            doc_of = np.repeat(np.arange(len(n)), nspans)
            first = np.concatenate(([0], np.cumsum(nspans)[:-1]))
            ln = np.arange(total, dtype=np.int64) - np.repeat(first, nspans)
            starts = offs[:-1][doc_of] + ln * w
            # spans tile each doc contiguously, so consecutive starts double
            # as list offsets; the final boundary is the last doc's end.
            span_offs = np.append(starts, offs[-1]).astype(np.int32)
            spans = pa.ListArray.from_arrays(pa.array(span_offs, pa.int32()),
                                             toks.values)
            lines = pc.binary_join(spans, " ")
        else:
            parts = pc.split_pattern(text, self.pattern)
            offs = parts.offsets.to_numpy(zero_copy_only=False)
            n = np.diff(offs)
            total = int(n.sum())
            doc_of = np.repeat(np.arange(len(n)), n)
            first = np.concatenate(([0], np.cumsum(n)[:-1]))
            ln = np.arange(total, dtype=np.int64) - np.repeat(first, n)
            lines = parts.values
        out_ids = ids[doc_of].astype(np.int64)
        pack = (out_ids << np.int64(32)) | ln
        return pa.table({"doc_id": pa.array(out_ids),
                         "ln": pa.array(ln),
                         "line": lines,
                         "pack": pa.array(pack)})


def _keep_winners(t: pa.Table) -> pa.Table:
    mask = pc.equal(t["pack"], t["win"])
    return t.filter(mask).select(["doc_id", "ln", "line"])


def dedup_spans(docs, *, span_tokens: int | None = 10, pattern: str = "\n"):
    """Corpus-level exact span/line dedup over a (doc_id, text) Dataset.

    Returns (doc_id, kept_text): each doc rebuilt from the spans whose first
    global occurrence (min (doc_id, ln)) it owns; docs that keep nothing are
    dropped (they were exact full duplicates of earlier docs).
    """
    from ray.data.aggregate import Min

    exploder = SpanExploder(span_tokens, pattern)
    ex = docs.map_batches(exploder, batch_format="pyarrow")
    winners = ex.groupby("line").aggregate(Min("pack", alias_name="win"))
    kept = attach_columns(ex, winners, "line", "line", {"win": "win"},
                          how="inner")
    kept = kept.map_batches(_keep_winners, batch_format="pyarrow")

    joiner = exploder.joiner

    def _rebuild(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("ln", "ascending")])
        lines = pc.take(g["line"], order)
        return pa.table({
            "doc_id": pa.array([g["doc_id"][0].as_py()], pa.int64()),
            "kept_text": pa.array([joiner.join(lines.to_pylist())]),
        })

    return kept.groupby("doc_id").map_groups(_rebuild, batch_format="pyarrow")


def span_dedup(sf_dir: str, span_tokens: int = 10):
    """(doc_id, kept_text) — token-span dedup tier over the documents table
    (SQL-checked: the DuckDB oracle rebuilds via unnest + window + agg)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dedup_spans(docs, span_tokens=span_tokens).sort("doc_id")


def line_dedup(docs):
    """(doc_id, kept_text) — newline-delimited exact line dedup (RefinedWeb
    boilerplate removal) over any (doc_id, text) Dataset."""
    return dedup_spans(docs, span_tokens=None, pattern="\n").sort("doc_id")
