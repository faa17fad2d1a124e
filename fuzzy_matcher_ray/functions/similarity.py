"""Similarity kernels: Jaro-Winkler, Levenshtein, Jaccard, weighted scores.

Parity targets:
- ``/root/reference/fuzzy_matcher_core/distance.go:19-38``: JaroWinkler via
  matchr (long-tolerance variant), Levenshtein normalized as
  ``1 - dist/max(len)``, "Default" method constant 1.0 (exact-match fields are
  gated upstream, not scored).
- weighted sum ``score = Σ weight_f · sim_f``: fuzzy_matcher_core.go:262-267.

Reference tests assert score *ranges*, not exact floats (scores depend on
matchr internals) — these implementations follow the published Jaro-Winkler /
Winkler long-string formulas and land inside every golden range
(tests/test_data/distance_tests.json).
"""

from __future__ import annotations

import numpy as np


def jaro(s1: str, s2: str) -> float:
    """Classic Jaro similarity. Empty-vs-anything → 0.0 (matchr behavior)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    match1 = [False] * len1
    match2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(len2, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s2[j] == c:
                match1[i] = True
                match2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(len1):
        if match1[i]:
            while not match2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    m = float(matches)
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, long_tolerance: bool = True,
                 prefix_weight: float = 0.1, boost_threshold: float = 0.7,
                 prefix_size: int = 4) -> float:
    """Jaro-Winkler with the long-string adjustment (matchr JaroWinkler(_,_,true))."""
    j = jaro(s1, s2)
    if j == 0.0:
        return 0.0
    len1, len2 = len(s1), len(s2)
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix >= prefix_size:
            break
        prefix += 1
    sim = j
    if j > boost_threshold and prefix > 0:
        sim = j + prefix * prefix_weight * (1.0 - j)
    if long_tolerance and min(len1, len2) > 4:
        # Winkler long-string variant: extra credit for many matches in long strings
        # (published Jaro-Winkler long-tolerance formula; matchr implements it too)
        m = _jaro_matches(s1, s2)
        if m - prefix >= 2 and 2 * m >= min(len1, len2) + prefix:
            sim = sim + (1.0 - sim) * (m - prefix - 1) / (len1 + len2 - 2 * (prefix - 1))
    return sim


def _jaro_matches(s1: str, s2: str) -> int:
    """Number of Jaro matching characters (helper for long tolerance)."""
    len1, len2 = len(s1), len(s2)
    window = max(max(len1, len2) // 2 - 1, 0)
    match2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - window), min(len2, i + window + 1)):
            if not match2[j] and s2[j] == c:
                match2[j] = True
                matches += 1
                break
    return matches


def levenshtein(s1: str, s2: str) -> int:
    """Unit-cost edit distance, numpy row-DP (vectorized over the inner loop)."""
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        cur = np.empty_like(prev)
        cur[0] = i
        sub = prev[:-1] + (b != ca)
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        # insertion needs a sequential scan-min; do it with a cummin trick:
        # cur[j] = min(cur[j], cur[j-1]+1) left-to-right == cummin of cur - j, + j
        steps = np.arange(len(cur), dtype=np.int64)
        cur = np.minimum.accumulate(cur - steps) + steps
        prev = cur
    return int(prev[-1])


def levenshtein_norm(s1: str, s2: str) -> float:
    """1 - dist/max(byte-len) — distance.go:24-33 (Go len() is bytes; ASCII ⇒ chars)."""
    max_len = max(len(s1.encode()), len(s2.encode()))
    if max_len == 0:
        return 1.0
    return 1.0 - levenshtein(s1, s2) / max_len


def similarity(s1: str, s2: str, method: str) -> float:
    """Dispatch ≙ CalculateSimilarity (distance.go:19-38)."""
    if method == "jaro_winkler":
        return jaro_winkler(s1, s2, long_tolerance=True)
    if method == "levenshtein":
        return levenshtein_norm(s1, s2)
    return 1.0  # "exact"/Default: constant; equality gating happens upstream


def jaccard_pairs(uniq_a: list[np.ndarray], uniq_b: list[np.ndarray]) -> np.ndarray:
    """Exact Jaccard per pair of sorted-unique uint64 shingle-hash sets."""
    out = np.empty(len(uniq_a), dtype=np.float64)
    for i, (ua, ub) in enumerate(zip(uniq_a, uniq_b)):
        if len(ua) == 0 and len(ub) == 0:
            out[i] = 1.0
            continue
        if len(ua) == 0 or len(ub) == 0:
            out[i] = 0.0
            continue
        inter = len(np.intersect1d(ua, ub, assume_unique=True))
        out[i] = inter / (len(ua) + len(ub) - inter)
    return out


def weighted_score(sims: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """score = Σ weight_f · sim_f over axis 1 (fuzzy_matcher_core.go:262-267)."""
    return sims @ weights
