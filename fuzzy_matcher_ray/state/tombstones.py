"""Mutation surface: tombstone removal + TTL expiry — as read-time predicates.

≙ reference ``RemoveEntries`` (trie surgery, clean.go:93-134) and the expiry
min-heap ``Clean`` (clean.go:29-51). Artifacts here are immutable columnar
files, so removal = anti-join against a tombstone id table and expiry = a
vectorized timestamp predicate applied at every pipeline start (the reference
likewise re-cleans on every Search, fuzzy_matcher.go:29-32).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from fuzzy_matcher_ray.stages.joins import anti_join


def remove_ids(docs, tombstones, key: str = "doc_id", num_partitions: int = 32):
    """Drop rows of ``docs`` whose ``key`` appears in ``tombstones`` (doc_id)."""
    return anti_join(docs, tombstones, key, "doc_id", num_partitions)


def filter_expired(docs, now, col: str = "valid_until"):
    """Keep rows with valid_until >= now (nulls = no expiry → kept).

    ``now`` must be passed in explicitly (deterministic pipelines — no
    wall-clock reads inside stages).
    """
    now_scalar = pa.scalar(now, pa.timestamp("us")) if not isinstance(now, pa.Scalar) else now

    def _f(t: pa.Table) -> pa.Table:
        if col not in t.schema.names:
            return t
        alive = pc.fill_null(pc.greater_equal(t[col], now_scalar), True)
        return t.filter(alive)

    return docs.map_batches(_f, batch_format="pyarrow")
