"""Document fingerprints: content hash + winnowed window fingerprints.

- ``content_hash``: vectorized 64-bit position-sensitive hash of each string →
  exact-dedup key (≙ terminal-node ID set dedup, fuzzy_types/types.go:38).
  64-bit keys can collide at 10^12-doc scale, so the exact-dedup stage groups
  by (hash, length) and compares actual texts within each group — a collision
  costs a few extra bytes in one group, never a wrong dedup.
- ``winnow_batch``: Schleimer et al. winnowing — ``window``-char rolling
  hashes, keep the minimum of every ``winnow`` consecutive hashes. Any shared
  substring of length >= window + winnow - 1 yields at least one identical
  fingerprint in both documents → the shuffle-friendly half of the
  substring-dedup stage (groupby fingerprint co-locates candidates across
  partitions; the per-group suffix-array pass then verifies and extends).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_matcher_ray.functions.shingle import (
    counts_to_offsets,
    shingle_batch,
    splitmix64,
    string_buffer,
)

_K1 = np.uint64(0x9DDFEA08EB382D69)
_K2 = np.uint64(0xC2B2AE3D27D4EB4F)


def content_hash(texts: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash per string (order- and length-sensitive).

    Each (byte, position-in-doc) is mixed independently, per-doc mixes are
    summed (order captured by position), then finalized with the doc length.
    One numpy pass over the concatenated batch buffer — no per-row loop.
    """
    data, offsets = string_buffer(texts)
    n = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.uint64)
    if data.size == 0:
        return splitmix64(lens ^ np.uint64(seed))
    starts = offsets[:-1]
    pos = np.arange(len(data), dtype=np.uint64) - np.repeat(starts, lens.astype(np.int64)).astype(np.uint64)
    mixed = splitmix64(data.astype(np.uint64) * _K1 ^ (pos + np.uint64(1)) * _K2 ^ np.uint64(seed))
    sums = np.zeros(n, dtype=np.uint64)
    nonempty = lens > 0
    if nonempty.any():
        seg_starts = starts[nonempty]
        sums[nonempty] = np.add.reduceat(mixed, seg_starts)
    return splitmix64(sums ^ (lens * _K2))


def winnow_batch(texts: pa.Array | pa.ChunkedArray, window: int, winnow: int,
                 seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed fingerprints per document.

    Returns (fingerprints concat uint64, counts per doc): unique minima of
    every ``winnow``-hash stretch of the doc's ``window``-gram rolling hashes.
    """
    hashes, counts = shingle_batch(texts, k=window, seed=seed ^ 0x51A3)
    n_docs = len(counts)
    if hashes.size == 0:
        return (np.empty(0, np.uint64), np.zeros(n_docs, dtype=np.int64),
                np.empty(0, np.int64))
    offs = counts_to_offsets(counts)
    # TRUE winnowing, one vectorized pass over the whole batch: min of every
    # sliding window of `winnow` hashes — alignment-independent, so any
    # shared substring of length >= window + winnow - 1 selects at least one
    # identical fingerprint in both documents (Schleimer et al. guarantee).
    sel_chunks: list[np.ndarray] = []
    if hashes.size >= winnow:
        sw = np.lib.stride_tricks.sliding_window_view(hashes, winnow)
        # argmin on the strided view is ~10x slower than on contiguous data —
        # chunked contiguous copies keep memory bounded and speed high
        rel = np.empty(len(sw), dtype=np.int64)
        CH = 1 << 18
        for lo in range(0, len(sw), CH):
            rel[lo:lo + CH] = np.ascontiguousarray(sw[lo:lo + CH]).argmin(axis=1)
        g = np.arange(len(sw), dtype=np.int64)
        pos_all = rel + g                       # global index of each window min
        # keep windows fully inside one doc: start >= off[d], start+w <= off[d+1]
        w_counts = np.maximum(counts - winnow + 1, 0)
        starts = offs[:-1]
        from fuzzy_matcher_ray.functions.shingle import gather_ranges
        valid_sel = gather_ranges(pos_all, starts, w_counts)
        sel_chunks.append(valid_sel)
    # docs with 0 < cnt < winnow: single min over the whole segment
    small = (counts > 0) & (counts < winnow)
    if small.any():
        # per true segment [st, st+cnt): a single reduceat over only the small
        # docs' starts would extend each segment to the NEXT small doc's start,
        # mixing in intervening docs' hashes — min/argmin the real slice.
        for st, cnt in zip(offs[:-1][small].tolist(), counts[small].tolist()):
            sel_chunks.append(np.array(
                [st + int(hashes[st:st + cnt].argmin())], dtype=np.int64))
    if not sel_chunks:
        return (np.empty(0, np.uint64), np.zeros(n_docs, dtype=np.int64),
                np.empty(0, np.int64))
    sel = np.unique(np.concatenate(sel_chunks))     # global selected positions
    doc_of = np.searchsorted(offs, sel, side="right") - 1
    fp_vals = hashes[sel]
    # per-doc dedup by fp value, keeping the first (lowest) position
    order = np.lexsort((sel, fp_vals, doc_of))
    d_s, f_s, p_s = doc_of[order], fp_vals[order], sel[order]
    keep = np.empty(len(d_s), dtype=bool)
    keep[0] = True
    keep[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
    d_k, f_k, p_k = d_s[keep], f_s[keep], p_s[keep]
    fp_counts = np.bincount(d_k, minlength=n_docs).astype(np.int64)
    positions = (p_k - offs[d_k]).astype(np.int64)  # doc-relative char offset
    return f_k, fp_counts, positions
