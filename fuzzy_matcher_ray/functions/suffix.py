"""Suffix array + LCP for the substring-dedup stage.

Per-partition exact long-repeat detection (north rule's "suffix-array
substring-dedup"): build a suffix array over the concatenation of a
partition's normalized documents (separated by out-of-alphabet sentinels),
Kasai LCP over adjacent suffixes, and emit document pairs whose common
substring length >= min_len. Cross-partition repeats are caught by the
winnowed-fingerprint pass (functions/fingerprint.py) which co-partitions
window hashes; the partitioning assumption is documented there.

Prefix-doubling construction, O(n log^2 n) with numpy argsorts — no external
suffix-array library needed.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (any dtype castable to int64)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    # compact ranks
    order = np.argsort(rank, kind="stable")
    r = np.empty(n, dtype=np.int64)
    r[order] = np.cumsum(np.concatenate(([0], (np.diff(rank[order]) != 0).astype(np.int64))))
    rank = r
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        # second key: rank[i+k] or -1
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        tmp[order[0]] = 0
        prev_pair = (rank[order[:-1]], second[order[:-1]])
        cur_pair = (rank[order[1:]], second[order[1:]])
        changed = ((cur_pair[0] != prev_pair[0]) | (cur_pair[1] != prev_pair[1])).astype(np.int64)
        tmp[order[1:]] = np.cumsum(changed)
        rank = tmp.copy()
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of suffixes sa[i-1], sa[i]."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    s = np.asarray(s)
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def long_repeat_pairs(texts: list[bytes], doc_ids: np.ndarray,
                      min_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Pairs of documents sharing an exact substring of length >= min_len.

    Concatenates texts with unique sentinel values (>255) so no match spans a
    boundary, builds SA+LCP, and for each run of adjacent suffixes with
    lcp >= min_len links the distinct documents involved (adjacent linking is
    enough for *connectivity*; union-find downstream closes the clusters).
    """
    if not texts:
        e = np.empty(0, dtype=np.int64)
        return e, e
    chunks = []
    owner_chunks = []
    for i, t in enumerate(texts):
        arr = np.frombuffer(t, dtype=np.uint8).astype(np.int64)
        chunks.append(arr)
        chunks.append(np.array([256 + i], dtype=np.int64))  # unique sentinel
        owner_chunks.append(np.full(len(arr) + 1, i, dtype=np.int64))
    s = np.concatenate(chunks)
    owner = np.concatenate(owner_chunks)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    hit = lcp >= min_len
    if not hit.any():
        e = np.empty(0, dtype=np.int64)
        return e, e
    ia = owner[sa[np.nonzero(hit)[0] - 1]]
    ib = owner[sa[hit]]
    cross = ia != ib
    a = doc_ids[ia[cross]]
    b = doc_ids[ib[cross]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    if len(lo) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
    return uniq[:, 0], uniq[:, 1]
