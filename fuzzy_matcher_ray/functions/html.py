"""HTML → text extraction kernel (north-rule invariant stage).

The input_hint's Common-Crawl-style table carries ``html:binary`` next to
``text:string`` with a per-row invariant: the text extracted from ``html``
must be byte-identical to ``text`` for every url. The reference repo
(Fuzzy-Matcher) never parses HTML — its corpora arrive pre-extracted — so
the invariant is defined against the generator in ``sources/webpages.py``,
which encodes the full document text into a realistic page (head/title,
script/style/nav/footer boilerplate, comments, inline markup, numeric
character entities) and is decoded exactly by this kernel.

Extraction is a vectorized Arrow RE2 chain (``pc.replace_substring_regex``
over the whole column — no per-row Python in the common case); only rows
that still contain ``&`` after noise removal fall back to a sparse
``html.unescape`` loop (character entities need computed replacements,
which RE2 cannot express).
"""

from __future__ import annotations

import html as _htmllib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Elements whose entire content is boilerplate/noise, never document text.
NOISE_ELEMENTS = ("script", "style", "head", "nav", "footer", "template",
                  "aside")

_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"[\t\n\r ]+"

# Python-side twin of the Arrow chain, for scalar use + tests.
_PY_COMMENT = re.compile(_COMMENT_RE)
_PY_NOISE = [re.compile(rf"(?si)<{el}\b[^>]*>.*?</{el}\s*>")
             for el in NOISE_ELEMENTS]
_PY_TAG = re.compile(_TAG_RE)
_PY_WS = re.compile(_WS_RE)


def extract_text_column(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """binary/string HTML column → extracted-text string column.

    Null html stays null (unknown payload ≠ empty document — the same
    NULL-propagation rule as ``normalize_text``).
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    s = pc.cast(html_col, pa.string())  # validates utf-8
    s = pc.replace_substring_regex(s, pattern=_COMMENT_RE, replacement="")
    for el in NOISE_ELEMENTS:
        s = pc.replace_substring_regex(
            s, pattern=rf"(?si)<{el}\b[^>]*>.*?</{el}\s*>", replacement="")
    s = pc.replace_substring_regex(s, pattern=_TAG_RE, replacement="")
    s = pc.replace_substring_regex(s, pattern=_WS_RE, replacement=" ")
    s = pc.utf8_trim_whitespace(s)
    # sparse entity decode: only rows still holding '&' (attributes and
    # noise blocks are already gone, so '&' now only comes from entities)
    has_amp = pc.fill_null(
        pc.match_substring(s, "&"), False).to_numpy(zero_copy_only=False)
    if has_amp.any():
        vals = s.to_pylist()
        for i in np.flatnonzero(has_amp):
            vals[i] = _htmllib.unescape(vals[i])
        s = pa.array(vals, pa.string())
    return s


def extract_text(html_bytes: bytes | str | None) -> str | None:
    """Scalar twin of ``extract_text_column`` (tests / driver-side checks)."""
    if html_bytes is None:
        return None
    s = html_bytes.decode("utf-8") if isinstance(html_bytes, bytes) else html_bytes
    s = _PY_COMMENT.sub("", s)
    for rx in _PY_NOISE:
        s = rx.sub("", s)
    s = _PY_TAG.sub("", s)
    s = _PY_WS.sub(" ", s).strip()
    if "&" in s:
        s = _htmllib.unescape(s)
    return s
