"""fuzzy_matcher_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch engine with the query semantics of the reference Fuzzy-Matcher
(normalized multi-field similarity matching, two-phase candidate generation +
precise verification, weighted scoring, thresholding, top-k, incremental
add/remove/expiry), generalized to web-scale near-duplicate detection:

- exact dedup (content-hash groupby)
- MinHash/LSH near-dup (5-gram shingles, 128 perms, b=16 r=8)
- SimHash Hamming-band near-dup
- substring dedup (winnowed fingerprints + per-partition suffix arrays)
- distributed connected components (min-label propagation / union-find)
- entity matching (per-field Jaro-Winkler / Levenshtein / exact, weighted)
- embedding k-NN + cosine near-dup
- text analysis (lang-id, quality, token counts, fingerprints)

Everything is expressed as ``ray.data.Dataset`` pipelines: ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, ``groupby`` for the
wide shuffles. No global mutable index exists anywhere — the reference's trie
(``/root/reference/fuzzy_matcher_core/fuzzy_matcher_core.go:14-19``) dissolves
into columnar signature artifacts on the object store.
"""

from fuzzy_matcher_ray.config import PipelineConfig, EntityMatchConfig

__all__ = ["PipelineConfig", "EntityMatchConfig"]
__version__ = "0.1.0"
