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


def attach_pair_texts(pairs, docs_norm, cfg: PipelineConfig,
                      col: str = "norm_text", attacher=None):
    """pairs (a,b) → (a, b, text_a, text_b).

    Pass a shared ``BroadcastAttacher`` to reuse one collected/broadcast copy
    of the doc texts across every pass of a pipeline run.
    """
    if attacher is not None:
        out = attacher.attach(pairs, "a", {col: "text_a"})
        return attacher.attach(out, "b", {col: "text_b"})
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


def _extend_match(ta: str, ia: int, tb: str, ib: int, width: int) -> int:
    """Length of the maximal common run around the identical seed window
    ta[ia:ia+width] == tb[ib:ib+width]. Chunked slice compares (C speed)."""
    left = 0
    step = 256
    while True:
        s = min(step, ia - left, ib - left)
        if s <= 0:
            break
        if ta[ia - left - s: ia - left] == tb[ib - left - s: ib - left]:
            left += s
        else:
            s = 1
            while ia - left - 1 >= 0 and ib - left - 1 >= 0 and \
                    ta[ia - left - 1] == tb[ib - left - 1]:
                left += 1
            break
    right = width
    la, lb = len(ta), len(tb)
    while True:
        s = min(step, la - ia - right, lb - ib - right)
        if s <= 0:
            break
        if ta[ia + right: ia + right + s] == tb[ib + right: ib + right + s]:
            right += s
        else:
            while ia + right < la and ib + right < lb and \
                    ta[ia + right] == tb[ib + right]:
                right += 1
            break
    return left + right


class SubstringVerifier:
    """(a, b, text_a, text_b, pp) → (a, b, common_len) for pairs sharing a
    substring >= min_len.

    Fast path: unpack the shared-fingerprint seed positions (pp = pos_a<<21 |
    pos_b, from the winnow stage), confirm the seed windows are identical and
    extend the run with chunked slice compares — O(match) per pair.
    Fallback (null/overflow pp, seed mismatch from a hash collision): full
    suffix-array + Kasai LCP over the concatenated pair, max cross-document
    LCP == longest common substring (functions/suffix.py).
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def _sa_common_len(self, ta: str, tb: str) -> int:
        s = np.concatenate([
            np.frombuffer(ta.encode(), dtype=np.uint8).astype(np.int64),
            np.array([256], dtype=np.int64),
            np.frombuffer(tb.encode(), dtype=np.uint8).astype(np.int64)])
        boundary = len(ta.encode())
        sa = suffix_array(s)
        lcp = lcp_array(s, sa)
        side = sa > boundary                # suffix starts in text_b
        cross = np.zeros(len(s), dtype=bool)
        cross[1:] = side[1:] != side[:-1]
        return int(lcp[cross].max()) if cross.any() else 0

    def _try_seed(self, ta: str, tb: str, pp, width: int) -> int:
        if pp is None or not (0 <= pp < (1 << 62)):
            return -1                       # no usable seed
        ia, ib = pp >> 21, pp & ((1 << 21) - 1)
        if ia + width <= len(ta) and ta[ia: ia + width] == tb[ib: ib + width]:
            return _extend_match(ta, ia, tb, ib, width)
        return 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        min_len = cfg.substr_min_len
        width = cfg.substr_window
        # a repeat of min_len chars holds (min_len - window - winnow + 2)
        # winnow windows ⇒ at least this many selected fingerprints:
        nw = min_len - width - cfg.substr_winnow + 2
        n_needed = max(1, -(-nw // cfg.substr_winnow)) if nw > 0 else 1
        names = batch.schema.names
        n = len(batch)
        pps = batch["pp"].to_pylist() if "pp" in names else [None] * n
        pp2s = batch["pp2"].to_pylist() if "pp2" in names else [None] * n
        nfps = batch["n_fp"].to_pylist() if "n_fp" in names else [n_needed] * n
        ta_list = batch["text_a"].to_pylist()
        tb_list = batch["text_b"].to_pylist()
        a_list = batch["a"].to_pylist()
        b_list = batch["b"].to_pylist()
        a_out, b_out, l_out = [], [], []
        for i in range(n):
            ta = ta_list[i] or ""
            tb = tb_list[i] or ""
            if min(len(ta), len(tb)) < min_len:
                continue
            e1 = self._try_seed(ta, tb, pps[i], width)
            best = max(e1, 0)
            if best < min_len and pp2s[i] != pps[i]:
                best = max(best, self._try_seed(ta, tb, pp2s[i], width))
            if best < min_len:
                seedless = e1 < 0
                if seedless or (nfps[i] or 0) >= n_needed:
                    # seedless (hot-group) pair, or enough shared fps that a
                    # long repeat could hide between the min/max seeds → SA
                    best = self._sa_common_len(ta, tb)
            if best >= min_len:
                a_out.append(a_list[i])
                b_out.append(b_list[i])
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
