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
    fp_chunks: list[np.ndarray] = []
    fp_counts = np.zeros(n_docs, dtype=np.int64)
    offs = counts_to_offsets(counts)
    for d in range(n_docs):
        h = hashes[offs[d]: offs[d + 1]]
        if h.size == 0:
            continue
        n_win = -(-h.size // winnow)                   # ceil division
        pad = n_win * winnow - h.size
        hp = np.pad(h, (0, pad), constant_values=np.uint64(0xFFFFFFFFFFFFFFFF))
        mins = hp.reshape(n_win, winnow).min(axis=1)
        u = np.unique(mins)
        fp_chunks.append(u)
        fp_counts[d] = len(u)
    fps = np.concatenate(fp_chunks) if fp_chunks else np.empty(0, np.uint64)
    return fps, fp_counts
