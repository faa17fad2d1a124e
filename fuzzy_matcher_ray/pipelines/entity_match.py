"""Entity matching: the reference's flagship ``Search`` query as a Ray
pipeline — multi-field normalized fuzzy matching with weighted scoring,
thresholds and per-query top-k.

Parity map (vs ``/root/reference``):
- normalize per field            ← normalize.go:9-15
- OCR confusable folding (blocking keys only) ← recurse.go:7-41 tables
- short-record exact-only tier   ← example_source.go:28-39 (avg len <= 3.5)
- candidate generation           ← trie Recurse/BFS (recurse.go:67-175) —
  here: character-n-gram blocking keys per (field, gram); fuzzy-tier records
  emit grams, exact-tier/exact-method fields emit the full value only
- per-field verification         ← CalculateSimilarity dispatch
  (distance.go:19-38) + MinDistances reject (fuzzy_matcher_core.go:249-252)
- missing required field reject  ← fuzzy_matcher_core.go:230-234
- weighted sum                   ← fuzzy_matcher_core.go:262-267
- global edit budget             ← CleanMatches (clean.go:54-90)
- sort desc + top-k              ← fuzzy_matcher_core.go:281-287
- TTL filter / tombstones        ← clean.go:29-51 / clean.go:93-134 as
  read-time predicates (state/tombstones.py)

Scale shape: both sides are Datasets; blocking is a hash join on
(field, gram) keys; verification is a batched kernel over candidate pairs
with field values attached by broadcast lookup (index side small) or hash
join (both sides large).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from fuzzy_matcher_ray.config import EntityMatchConfig, FieldParams
from fuzzy_matcher_ray.functions.normalize import fold_confusables, normalize_text
from fuzzy_matcher_ray.functions.similarity import levenshtein, similarity
from fuzzy_matcher_ray.stages.joins import JOIN_AGG_ARGS, attach_columns, effective_partitions


def _grams(s: str, k: int) -> set[str]:
    if len(s) < k:
        return {s} if s else set()
    return {s[i:i + k] for i in range(len(s) - k + 1)}


def _is_exact_tier(fields: dict[str, str], cfg: EntityMatchConfig) -> bool:
    """Short-record rule: avg(len(firstname), len(surname)) <= threshold ⇒
    exact-only (example_source.go:28-39). Falls back to all-field average
    when those fields are absent."""
    probe = [f for f in ("firstname", "surname") if f in fields]
    if not probe:
        probe = list(fields)
    lens = [len(fields[f] or "") for f in probe]
    return (sum(lens) / max(len(lens), 1)) <= cfg.short_avg_len


class _KeyEmitter:
    """Record rows → blocking key rows (field, gram, rec_id)."""

    def __init__(self, cfg: EntityMatchConfig, id_col: str):
        self.cfg = cfg
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids_out, fields_out, grams_out = [], [], []
        ids = batch[self.id_col].to_pylist()
        field_vals = {f: batch[f].to_pylist() for f in cfg.fields
                      if f in batch.schema.names}
        for i, rid in enumerate(ids):
            vals = {f: normalize_text(v[i] or "") for f, v in field_vals.items()}
            exact_tier = _is_exact_tier(vals, cfg)
            for f, params in cfg.fields.items():
                s = vals.get(f, "")
                if not s:
                    continue
                # OCR folding only where edits are allowed — exact fields
                # never take OCR branches (editable-fields mask,
                # fuzzy_matcher_core.go:129-140; 6→b / 8→b would otherwise
                # alias distinct exact keys like birthdates)
                fuzzy = not exact_tier and params.max_edits > 0
                folded = fold_confusables(s) if (cfg.ocr_fold and fuzzy) else s
                if not fuzzy:
                    keys = {folded}            # exact blocking only
                else:
                    keys = _grams(folded, cfg.gram_k)
                for g in keys:
                    ids_out.append(rid)
                    fields_out.append(f)
                    grams_out.append(g)
        return pa.table({
            "rec_id": pa.array(ids_out, pa.int64()),
            "field": pa.array(fields_out, pa.string()),
            "gram": pa.array(grams_out, pa.string()),
        })


class _Verifier:
    """(query_id, rec_id, q_<field>…, i_<field>…) → scored matches.

    Vectorized over the batch; per-field string kernels on short fields.
    """

    def __init__(self, cfg: EntityMatchConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        qcols = {f: batch[f"q_{f}"].to_pylist() for f in cfg.fields}
        icols = {f: batch[f"i_{f}"].to_pylist() for f in cfg.fields}
        scores = np.zeros(n, dtype=np.float64)
        edits = np.zeros(n, dtype=np.int64)
        ok = np.ones(n, dtype=bool)
        for f, params in cfg.fields.items():
            qs, is_ = qcols[f], icols[f]
            for i in range(n):
                if not ok[i]:
                    continue
                q = normalize_text(qs[i] or "")
                v = normalize_text(is_[i] or "")
                if not q or not v:
                    if params.required:
                        ok[i] = False      # missing required ⇒ reject
                    continue
                if params.method == "exact" or params.max_edits == 0:
                    if q != v:
                        ok[i] = False
                        continue
                    sim = 1.0
                    ed = 0
                else:
                    if cfg.ocr_fold:
                        # OCR-variant tolerance: score the folded forms so
                        # confusable damage (srnith↔smith) doesn't burn the
                        # similarity budget (≙ recurse.go OCR branches)
                        q, v = fold_confusables(q), fold_confusables(v)
                    sim = similarity(q, v, params.method)
                    if sim < params.min_similarity:
                        ok[i] = False      # below MinDistances ⇒ reject
                        continue
                    # prefix completion is trie *depth*, not edits
                    # (BFS completion, breadth_first_search.go:25-101) —
                    # "ben"→"benjamin" costs 0 toward the edit budget
                    if q.startswith(v) or v.startswith(q):
                        ed = 0
                    else:
                        ed = levenshtein(q, v)
                scores[i] += params.weight * sim
                edits[i] += ed
        ok &= edits <= cfg.global_max_edits    # ≙ CleanMatches budget
        ok &= scores >= cfg.min_score
        keep = pa.array(ok)
        return pa.table({
            "query_id": batch["query_id"].filter(keep),
            "rec_id": batch["rec_id"].filter(keep),
            "score": pa.array(scores[ok]),
            "total_edits": pa.array(edits[ok]),
        })


def match_entities(index_ds, query_ds, cfg: EntityMatchConfig | None = None,
                   id_col: str = "id", query_id_col: str = "query_id"):
    """Find top-k fuzzy matches in ``index_ds`` for every row of ``query_ds``.

    Returns (query_id, rec_id, score, rnk) — ≙ FuzzyMatch ranking
    (fuzzy_types/types.go:44-47 + sort/truncate fuzzy_matcher_core.go:281-287).
    """
    cfg = cfg or EntityMatchConfig()
    fields = list(cfg.fields)
    P = effective_partitions(16)

    empty = rd.from_arrow(pa.table({
        "query_id": pa.array([], pa.int64()),
        "rec_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
        "total_edits": pa.array([], pa.int64()),
        "rnk": pa.array([], pa.int64())}))
    idx_keys = index_ds.map_batches(_KeyEmitter(cfg, id_col),
                                    batch_format="pyarrow").materialize()
    q_keys = query_ds.map_batches(_KeyEmitter(cfg, query_id_col),
                                  batch_format="pyarrow").materialize()
    if idx_keys.count() == 0 or q_keys.count() == 0:
        return empty      # joining an empty side breaks the shuffle schema
    # blocking join: hash-partitioned on (field, gram)
    joined = q_keys.join(idx_keys, "inner", P, on=("field", "gram"),
                         left_suffix="_q", right_suffix="_i",
                         aggregator_ray_remote_args=JOIN_AGG_ARGS)
    cands = joined.map_batches(
        lambda t: pa.table({"query_id": t["rec_id_q"], "rec_id": t["rec_id_i"]}),
        batch_format="pyarrow")
    cands = cands.groupby(["query_id", "rec_id"]).count() \
                 .select_columns(["query_id", "rec_id"]).materialize()
    if cands.count() == 0:
        return empty
    # attach field values of both sides
    for f in fields:
        cands = attach_columns(cands, query_ds.select_columns([query_id_col, f]),
                               "query_id", query_id_col, {f: f"q_{f}"},
                               how="inner", num_partitions=P)
        cands = attach_columns(cands, index_ds.select_columns([id_col, f]),
                               "rec_id", id_col, {f: f"i_{f}"},
                               how="inner", num_partitions=P)
    scored = cands.map_batches(_Verifier(cfg), batch_format="pyarrow",
                               batch_size=4096)

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "rec_id"], ascending=[False, True]) \
             .head(cfg.top_k).reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g
    out = scored.groupby("query_id").map_groups(_topk, batch_format="pandas")
    return out.sort(["query_id", "rnk"])
