"""HTML extraction as an actor-pool ``map_batches`` stage.

The north-rule shape: "map_batches actor pools computing byte-identical
extracted text per url". The wide ``html`` binary column enters exactly one
stage and is dropped on the way out, so it never travels further through
the pipeline than this operator (same discipline as
``normalize_stage`` dropping raw text).

State in ``__init__`` is tiny today (compiled regex chain), but the stage
keeps the callable-class shape so a real DOM parser / boilerplate model
loads once per actor, not once per batch.
"""

from __future__ import annotations

import pyarrow as pa

from fuzzy_matcher_ray.functions.html import extract_text_column


class HtmlExtractor:
    def __init__(self, drop_html: bool = True, out_col: str = "text"):
        import re

        from fuzzy_matcher_ray.functions import html as _h
        self.drop_html = drop_html
        self.out_col = out_col
        # touch the module-level compiled patterns so per-actor setup cost
        # is paid here, not in the first __call__
        self._patterns = (_h._PY_COMMENT, *_h._PY_NOISE, _h._PY_TAG)
        assert all(isinstance(p, re.Pattern) for p in self._patterns)

    def __call__(self, t: pa.Table) -> pa.Table:
        text = extract_text_column(t["html"])
        cols = {name: t[name] for name in t.schema.names
                if not (self.drop_html and name == "html")}
        cols[self.out_col] = text
        return pa.table(cols)


def extract_pages(ds, *, concurrency=(1, 8), batch_size: int = 256,
                  drop_html: bool = True):
    """Dataset with an ``html:binary`` column → same rows with ``text``
    replaced by the extracted text (html dropped by default)."""
    return ds.map_batches(HtmlExtractor, batch_format="pyarrow",
                          fn_constructor_kwargs={"drop_html": drop_html},
                          batch_size=batch_size, concurrency=concurrency)
