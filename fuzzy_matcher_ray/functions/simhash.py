"""64-bit SimHash + Hamming-band keys (vectorized).

Second near-dup pass of the flagship pipeline (north rule): catches
high-overlap documents whose Jaccard sits just under the MinHash S-curve.
Standard construction (Charikar 2002): per document, sum the ±1 bit vectors of
its feature hashes; sign → bit. Banding: a 64-bit simhash split into
``blocks`` equal blocks; two docs within Hamming distance d share at least one
identical block when blocks > d (pigeonhole), so grouping on
(block_id, block_value) is a complete candidate generator for distance
<= blocks - 1.
"""

from __future__ import annotations

import numpy as np

from fuzzy_matcher_ray.functions.shingle import counts_to_offsets

_BITS = np.arange(64, dtype=np.uint64)


def simhash_batch(hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(n_docs,) uint64 simhash per doc from concatenated shingle hashes.

    Zero-shingle docs get simhash 0 (callers exclude them from banding).
    """
    n_docs = len(counts)
    out = np.zeros(n_docs, dtype=np.uint64)
    if hashes.size == 0:
        return out
    nonempty = counts > 0
    seg_starts = counts_to_offsets(counts[nonempty])[:-1]
    ne_counts = counts[nonempty]
    vals = np.zeros(len(ne_counts), dtype=np.uint64)
    # per-bit 1D passes: contiguous shift/mask/reduceat are SIMD-fast, unlike
    # the broadcast (m, 64) bit matrix (which also costs m*64 bytes). One
    # scratch reused across all 64 bits — no per-bit multi-MB temporaries.
    scratch = np.empty_like(hashes)
    for j in range(64):
        np.right_shift(hashes, np.uint64(j), out=scratch)
        np.bitwise_and(scratch, np.uint64(1), out=scratch)
        sums = np.add.reduceat(scratch.view(np.int64), seg_starts)  # 0/1 vals
        vals |= (((2 * sums) > ne_counts).astype(np.uint64) << np.uint64(j))
    out[nonempty] = vals
    return out


# Manku et al. (WWW'07) style block-combination keys: 64 bits split into 6
# pieces; every 3-piece combination (C(6,3)=20) forms a ~32-bit key. Hamming
# distance <= 3 damages <= 3 pieces ⇒ >= 3 pieces clean ⇒ at least one
# combination's key matches exactly (pigeonhole) — while 32-bit keys make
# random collisions ~2^16x rarer than 16-bit block keys.
_PIECE_WIDTHS = (11, 11, 11, 11, 10, 10)
_PIECE_OFFSETS = tuple(int(np.cumsum((0,) + _PIECE_WIDTHS[:-1])[i])
                       for i in range(6))


def simhash_combo_keys(sim: np.ndarray, r: int = 3) -> tuple[np.ndarray, int]:
    """(n, n_combos) int-keyed combination table for Hamming <= (6-r) // 1.

    Returns (keys, n_combos); combo index is the column. Guarantee: two
    simhashes within Hamming distance 6 - r share at least one column value.
    """
    from itertools import combinations
    pieces = [(sim >> np.uint64(off)) & np.uint64((1 << w) - 1)
              for off, w in zip(_PIECE_OFFSETS, _PIECE_WIDTHS)]
    cols = []
    for combo in combinations(range(6), r):
        k = np.zeros(len(sim), dtype=np.uint64)
        shift = 0
        for b in combo:
            k |= pieces[b] << np.uint64(shift)
            shift += _PIECE_WIDTHS[b]
        cols.append(k)
    return np.stack(cols, axis=1), len(cols)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a^b for uint64 arrays."""
    x = a ^ b
    # SWAR popcount
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
