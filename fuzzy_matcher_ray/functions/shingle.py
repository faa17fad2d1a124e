"""Character k-gram shingling via a single vectorized rolling hash per batch.

Replaces the reference's per-string trie insertion
(``/root/reference/fuzzy_matcher_core/fuzzy_matcher_core.go:29-56``): instead
of materializing a global index, every batch of documents is shingled in one
numpy pass — all documents' bytes concatenated, one polynomial rolling hash
over the whole buffer, windows that cross document boundaries masked out.
No per-row Python loop anywhere in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Polynomial base + splitmix64 finalizer constants (public-domain mixers).
_P = np.uint64(1099511628211)          # FNV prime as polynomial base
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraparound arithmetic)."""
    x = (x + _SM_GAMMA).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _SM_M1
    x = (x ^ (x >> np.uint64(27))) * _SM_M2
    return x ^ (x >> np.uint64(31))


def string_buffer(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(data bytes uint8, offsets int64) view of an Arrow string array.

    Zero-copy except for the cast to large_binary (offset widening). Nulls are
    treated as empty strings (their offsets are equal-valued in Arrow).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_binary())
    off_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    offsets = np.frombuffer(off_buf, dtype=np.int64, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset: arr.offset + len(arr) + 1]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.empty(0, np.uint8))
    return data, offsets


def gather_ranges(values: np.ndarray, starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate values[starts[i]:starts[i]+counts[i]] for all i, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return values[:0]
    # index = arange(total) offset so each segment restarts at its own start
    seg_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    idx = np.arange(total, dtype=np.int64) + np.repeat(starts - seg_starts, counts)
    return values[idx]


def shingle_batch(texts: pa.Array | pa.ChunkedArray, k: int,
                  seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Rolling-hash char k-grams for a batch of strings.

    Returns (hashes, counts): ``hashes`` is one concatenated uint64 array of
    all documents' shingle hashes (multiset, in order), ``counts[i]`` the
    number of shingles of document i. Documents shorter than k get 0 shingles.
    """
    data, offsets = string_buffer(texts)
    n_docs = len(offsets) - 1
    counts = np.maximum(offsets[1:] - offsets[:-1] - (k - 1), 0).astype(np.int64)
    if data.size < k:
        return np.empty(0, np.uint64), counts
    # one rolling hash over the entire concatenated buffer — k Horner passes
    # of O(m) each (constant memory; never materializes an (m, k) window
    # matrix, which would be ~1 GB per batch at k=100)
    m = data.size - k + 1
    d64 = data.astype(np.uint64)
    raw = np.zeros(m, dtype=np.uint64)
    for j in range(k):                  # uint64 wraparound is intended
        raw = raw * _P + d64[j: j + m]
    raw = splitmix64(raw ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    # keep only windows fully inside one document
    starts = offsets[:-1]
    hashes = gather_ranges(raw, starts, counts)
    assert len(hashes) == counts.sum()
    return hashes, counts


def counts_to_offsets(counts: np.ndarray) -> np.ndarray:
    """[c0,c1,..] → [0, c0, c0+c1, ...] int64 offsets."""
    out = np.empty(len(counts) + 1, dtype=np.int64)
    out[0] = 0
    np.cumsum(counts, out=out[1:])
    return out


def unique_per_doc(hashes: np.ndarray, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-document sorted-unique shingle sets (for exact Jaccard).

    Returns (uniq_hashes concatenated, uniq_counts per doc). Vectorized:
    sort within segments via a (doc_id, hash) composite lexsort, then drop
    adjacent duplicates within each segment.
    """
    if hashes.size == 0:
        return hashes, np.zeros_like(counts)
    doc_ids = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    order = np.lexsort((hashes, doc_ids))
    h = hashes[order]
    d = doc_ids[order]
    keep = np.empty(len(h), dtype=bool)
    keep[0] = True
    keep[1:] = (h[1:] != h[:-1]) | (d[1:] != d[:-1])
    uh, ud = h[keep], d[keep]
    uniq_counts = np.bincount(ud, minlength=len(counts)).astype(np.int64)
    return uh, uniq_counts
