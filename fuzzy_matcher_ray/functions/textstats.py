"""Text-analysis kernels: token counts, quality metrics, lang-id heuristic.

Training-data-pipeline operators over the ``documents`` table. All kernels are
Arrow/numpy-vectorized and return integer-valued columns where possible so the
DuckDB oracle comparison is exact (no float-hash mismatches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tiny deterministic English stopword probe — counts of these as substrings
# (space-padded) give an integer-valued language-likeness signal that an ANSI
# SQL oracle can reproduce exactly with replace()-length arithmetic.
EN_STOPWORDS: tuple[str, ...] = ("the", "and", "of", "to", "in")


def token_count(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace-token count: count_substring_regex of \\S+ runs."""
    out = pc.count_substring_regex(arr, pattern=r"[^ \t\n\r]+")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def char_classes(arr: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Integer quality counters: total / alpha / digit / space chars."""
    def _c(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
    return {
        "n_chars_total": _c(pc.utf8_length(arr)),
        "n_alpha": _c(pc.count_substring_regex(arr, pattern="[a-zA-Z]")),
        "n_digit": _c(pc.count_substring_regex(arr, pattern="[0-9]")),
        "n_space": _c(pc.count_substring_regex(arr, pattern=" ")),
    }


def stopword_hits(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Total occurrences of ``" <stopword> "`` substrings (int64).

    Space-padded so the SQL oracle's replace()-based count matches exactly.
    """
    total = None
    for w in EN_STOPWORDS:
        c = pc.count_substring(arr, pattern=f" {w} ")
        total = c if total is None else pc.add(total, c)
    total = pc.cast(total, pa.int64())
    return total.combine_chunks() if isinstance(total, pa.ChunkedArray) else total


def quality_tier(n_tokens: np.ndarray, n_chars: np.ndarray,
                 stop_hits: np.ndarray) -> np.ndarray:
    """Coarse integer quality tier 0..2 (vectorized, deterministic).

    0 = degenerate (too short), 1 = low (no stopword signal), 2 = ok.
    Mirrors the reference's validity gate shape (example_source.go:84-101):
    degenerate records take the exact-only path.
    """
    tier = np.full(len(n_tokens), 2, dtype=np.int8)
    tier[stop_hits == 0] = 1
    tier[(n_chars < 20) | (n_tokens < 4)] = 0
    return tier
