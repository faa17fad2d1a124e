"""Precise verification of candidate pairs.

≙ reference verify+score (``fuzzy_matcher_core.go:220-267``
CalculateSimilarity per field + threshold reject + weighted sum), re-expressed
as a batched numeric kernel over pair tables: exact 5-gram Jaccard for the
near-dup pipeline, suffix-array longest-common-substring for the substring
pass. Texts are attached by broadcast lookup or hash join
(``stages/joins.py``) — the per-batch kernel itself is pure numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_matcher_ray.config import PipelineConfig
from fuzzy_matcher_ray.functions.shingle import (
    counts_to_offsets, shingle_batch, unique_per_doc)
from fuzzy_matcher_ray.functions.suffix import lcp_array, suffix_array
from fuzzy_matcher_ray.stages.joins import attach_columns


def attach_pair_texts(pairs, docs_norm, cfg: PipelineConfig, col: str = "norm_text"):
    """pairs (a,b) → (a, b, text_a, text_b)."""
    out = attach_columns(pairs, docs_norm, "a", "doc_id", {col: "text_a"},
                         how="inner", num_partitions=cfg.join_num_partitions)
    out = attach_columns(out, docs_norm, "b", "doc_id", {col: "text_b"},
                         how="inner", num_partitions=cfg.join_num_partitions)
    return out


class JaccardVerifier:
    """(a, b, text_a, text_b) → (a, b, jaccard) for pairs ≥ threshold.

    Exact Jaccard over unique k-gram shingle sets; both sides shingled in one
    vectorized pass per batch, intersections via a single sort over the
    concatenated (pair_id, hash) rows — no per-pair Python set work.
    """

    def __init__(self, cfg: PipelineConfig, threshold: float | None = None):
        self.cfg = cfg
        self.threshold = cfg.jaccard_threshold if threshold is None else threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        k, seed = self.cfg.shingle_k, self.cfg.seed
        ua, ca = unique_per_doc(*shingle_batch(batch["text_a"], k, seed))
        ub, cb = unique_per_doc(*shingle_batch(batch["text_b"], k, seed))
        n = len(batch)
        # intersection sizes: concat both sides tagged by pair id; a hash
        # appearing twice within one pair id is an intersection element
        # (each side is unique within itself).
        pair_ids = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), ca),
                                   np.repeat(np.arange(n, dtype=np.int64), cb)])
        hashes = np.concatenate([ua, ub])
        order = np.lexsort((hashes, pair_ids))
        ph, pi = hashes[order], pair_ids[order]
        dup = np.zeros(len(ph), dtype=bool)
        if len(ph) > 1:
            dup[1:] = (ph[1:] == ph[:-1]) & (pi[1:] == pi[:-1])
        inter = np.bincount(pi[dup], minlength=n).astype(np.int64)
        union = ca + cb - inter
        both_empty = union == 0
        jac = np.where(both_empty, 1.0,
                       inter / np.maximum(union, 1))
        keep = jac >= self.threshold
        return pa.table({
            "a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[keep]),
            "b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[keep]),
            "jaccard": pa.array(jac[keep]),
        })


class SubstringVerifier:
    """(a, b, text_a, text_b) → (a, b) pairs sharing a substring ≥ min_len.

    Suffix-array + Kasai LCP per pair (the two texts concatenated with a
    sentinel): max cross-document LCP == longest common substring.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        min_len = self.cfg.substr_min_len
        a_out, b_out, l_out = [], [], []
        for i in range(len(batch)):
            ta = batch["text_a"][i].as_py() or ""
            tb = batch["text_b"][i].as_py() or ""
            if min(len(ta), len(tb)) < min_len:
                continue
            s = np.concatenate([
                np.frombuffer(ta.encode(), dtype=np.uint8).astype(np.int64),
                np.array([256], dtype=np.int64),
                np.frombuffer(tb.encode(), dtype=np.uint8).astype(np.int64)])
            boundary = len(ta)
            sa = suffix_array(s)
            lcp = lcp_array(s, sa)
            side = sa > boundary            # suffix starts in text_b
            cross = np.zeros(len(s), dtype=bool)
            cross[1:] = side[1:] != side[:-1]
            best = lcp[cross].max() if cross.any() else 0
            if best >= min_len:
                a_out.append(batch["a"][i].as_py())
                b_out.append(batch["b"][i].as_py())
                l_out.append(int(best))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "common_len": pa.array(l_out, pa.int64())})


def simhash_pair_filter(max_hamming: int):
    """Inline pair filter for SimHash candidates (runs before dedup shuffle)."""
    import numpy as np

    from fuzzy_matcher_ray.functions.simhash import hamming64

    def _f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        d = hamming64(t["simhash_a"].to_numpy(zero_copy_only=False).view(np.uint64),
                      t["simhash_b"].to_numpy(zero_copy_only=False).view(np.uint64))
        return t.filter(pa.array(d <= max_hamming))
    return _f
