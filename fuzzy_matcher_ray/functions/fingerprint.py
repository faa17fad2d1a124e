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


# windows-per-chunk for _sliding_argmin: bounds the two-block temporaries to
# ~2 MB each so they stay heap-resident and cache-warm instead of thrashing
# fresh multi-MB mmaps per batch (the concurrent first-touch fault storm
# that collapsed aggregate winnow throughput at high task counts)
_ARGMIN_CHUNK = 1 << 18


def _sliding_argmin(h: np.ndarray, w: int) -> np.ndarray:
    """Global index of the (leftmost) minimum of every length-``w`` sliding
    window over ``h`` — O(n), chunked; see ``_sliding_argmin_block``."""
    n = h.size
    m = n - w + 1
    if m <= _ARGMIN_CHUNK:
        return _sliding_argmin_block(h, w)
    out = np.empty(m, dtype=np.int64)
    for c0 in range(0, m, _ARGMIN_CHUNK):
        c1 = min(c0 + _ARGMIN_CHUNK, m)
        seg = h[c0: c1 + w - 1]            # covers window starts c0..c1-1
        out[c0:c1] = _sliding_argmin_block(seg, w)
        out[c0:c1] += c0
    return out


def _sliding_argmin_block(h: np.ndarray, w: int) -> np.ndarray:
    """One chunk of the two-block prefix/suffix-min sliding argmin
    (each window spans at most two w-aligned blocks; its min is
    min(suffix-min of the left block from the window start, prefix-min of
    the right block up to the window end)). ~w/4 times faster than the
    per-window argmin scan the naive formulation needs.
    """
    n = h.size
    m = n - w + 1                          # number of windows
    nb = (n + w - 1) // w                  # padded block count
    pad = nb * w - n
    hp = np.concatenate([h, np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF))]) \
        if pad else h
    blocks = hp.reshape(nb, w)
    cols = np.arange(w, dtype=np.int64)
    # prefix: min/argmin of block[:, :j+1]; leftmost on ties — only STRICT
    # decreases of the running min mark a new argmin (a later tie must not
    # displace the earlier occurrence)
    pmin = np.minimum.accumulate(blocks, axis=1)
    prev = np.empty_like(pmin)
    prev[:, 0] = np.uint64(0xFFFFFFFFFFFFFFFF)
    prev[:, 1:] = pmin[:, :-1]
    pidx = np.maximum.accumulate(
        np.where(blocks < prev, cols[None, :], -1), axis=1)
    # suffix: min/argmin of block[:, j:]; leftmost on ties
    rb = blocks[:, ::-1]
    smin = np.minimum.accumulate(rb, axis=1)[:, ::-1]
    sidx_r = np.where(rb == np.minimum.accumulate(rb, axis=1),
                      cols[None, :], -1)
    sidx = (w - 1) - np.maximum.accumulate(sidx_r, axis=1)[:, ::-1]
    # window starting at s: suffix part of block k = s // w from offset s%w,
    # prefix part of block k+1 up to offset (s+w-1) % w
    s = np.arange(m, dtype=np.int64)
    k = s // w
    o = s - k * w
    left_min = smin[k, o]
    left_idx = k * w + sidx[k, o]
    out = left_idx
    cross = o > 0                          # o == 0 → window == one block
    if cross.any():
        kc, oc = k[cross], o[cross]
        right_min = pmin[kc + 1, oc - 1]
        right_idx = (kc + 1) * w + pidx[kc + 1, oc - 1]
        take_right = right_min < left_min[cross]   # leftmost min on ties
        out = out.copy()
        out[np.nonzero(cross)[0][take_right]] = right_idx[take_right]
    return out


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
        pos_all = _sliding_argmin(hashes, winnow)
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
