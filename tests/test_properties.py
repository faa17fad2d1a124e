"""Property-based kernel tests (hypothesis): the vectorized kernels against
naive reference implementations on random inputs."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzzy_matcher_ray.functions.normalize import normalize_text
from fuzzy_matcher_ray.functions.shingle import (
    counts_to_offsets, shingle_batch, unique_per_doc)
from fuzzy_matcher_ray.functions.similarity import levenshtein
from fuzzy_matcher_ray.functions.suffix import lcp_array, suffix_array

TEXT = st.text(alphabet="abcdef 0., !", min_size=0, max_size=60)


def _naive_lev(s1: str, s2: str) -> int:
    prev = list(range(len(s2) + 1))
    for i, a in enumerate(s1, 1):
        cur = [i]
        for j, b in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (a != b)))
        prev = cur
    return prev[-1]


@settings(max_examples=150, deadline=None)
@given(TEXT, TEXT)
def test_levenshtein_matches_naive(s1, s2):
    assert levenshtein(s1, s2) == _naive_lev(s1, s2)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8), st.integers(2, 6))
def test_shingle_counts_and_sets(texts, k):
    arr = pa.array(texts, pa.string())
    h, c = shingle_batch(arr, k)
    for i, t in enumerate(texts):
        assert c[i] == max(0, len(t.encode()) - k + 1)
    uh, uc = unique_per_doc(h, c)
    offs = counts_to_offsets(uc)
    for i, t in enumerate(texts):
        bs = t.encode()
        expected = {bs[j: j + k] for j in range(max(0, len(bs) - k + 1))}
        assert uc[i] == len(expected)
        seg = uh[offs[i]: offs[i + 1]]
        assert len(np.unique(seg)) == len(seg)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=80))
def test_suffix_array_is_sorted_permutation(data):
    s = np.frombuffer(data, dtype=np.uint8)
    sa = suffix_array(s)
    assert sorted(sa.tolist()) == list(range(len(s)))
    suffixes = [data[i:] for i in sa.tolist()]
    assert suffixes == sorted(suffixes)
    lcp = lcp_array(s, sa)
    for i in range(1, len(s)):
        a, b = data[sa[i - 1]:], data[sa[i]:]
        common = 0
        while common < min(len(a), len(b)) and a[common] == b[common]:
            common += 1
        assert lcp[i] == common


@settings(max_examples=80, deadline=None)
@given(TEXT)
def test_normalize_idempotent_and_alnum(s):
    n = normalize_text(s)
    assert normalize_text(n) == n
    assert all(c.isascii() and c.isalnum() for c in n)


@settings(deadline=None, max_examples=200)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    max_size=40), min_size=1, max_size=20))
def test_canonical_url_idempotent(urls):
    """canonical_url is a projection: applying it twice = once."""
    from fuzzy_matcher_ray.pipelines.webtext import canonical_url
    once = canonical_url(pa.array(urls, pa.string()))
    twice = canonical_url(once)
    assert once.to_pylist() == twice.to_pylist()


@settings(deadline=None, max_examples=100)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30),
                          st.integers(1, 16)), min_size=1, max_size=60),
       st.integers(1, 5))
def test_budget_pairs_driver_invariants(raw, budget):
    """Driver-path budget filter: output ⊆ input; every endpoint with at
    least one pair keeps at least one; budget ≥ per-doc degree keeps all."""
    pairs = {(min(a, b), max(a, b)): h for a, b, h in raw if a != b}
    if not pairs:
        return
    from fuzzy_matcher_ray.stages.candidates import _budget_pairs_numpy
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    h = np.array(list(pairs.values()), dtype=np.int64)
    kept = _budget_pairs_numpy(a, b, h, budget)
    kept_set = set(map(tuple, kept))
    assert kept_set <= set(pairs)
    docs = set(a.tolist()) | set(b.tolist())
    touched = {d for p in kept_set for d in p}
    assert touched == docs
    from collections import Counter
    deg = Counter()
    for x, y in pairs:
        deg[x] += 1
        deg[y] += 1
    if budget >= max(deg.values()):
        assert kept_set == set(pairs)


URLISH = st.text(alphabet="abcz09./:?#-_", min_size=0, max_size=40)


@settings(max_examples=80, deadline=None)
@given(st.lists(URLISH, min_size=1, max_size=10))
def test_url_host_idempotent_and_pathfree(urls):
    from fuzzy_matcher_ray.pipelines.webtext import canonical_url, url_host
    arr = pa.array(urls, pa.string())
    hosts = url_host(arr)
    # a host is its own host (idempotence through the full kernel chain)
    assert url_host(hosts).to_pylist() == hosts.to_pylist()
    for h in hosts.to_pylist():
        assert "/" not in h                      # no path survives
        assert not h.startswith("www.")          # www. stripped
        assert h == h.lower()
    # the host is always a prefix of the canonical URL
    for h, c in zip(hosts.to_pylist(), canonical_url(arr).to_pylist()):
        assert c.startswith(h)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 1000)),
                min_size=1, max_size=60),
       st.integers(1, 4))
def test_unigram_fixed_point_is_order_free(pairs, k):
    # fixed-point per-token logs sum identically under any permutation —
    # the exact property the oracle hash relies on
    import math
    rng = np.random.default_rng(0)
    counts = np.array([p[1] + 1 for p in pairs], np.int64)
    total = float(counts.sum())
    lw = np.floor(np.log(counts / total) * 1e9 + 0.5).astype(np.int64)
    seq = np.array([p[0] % len(pairs) for p in pairs])
    a = lw[seq].sum()
    b = lw[seq[rng.permutation(len(seq))]].sum()
    assert a == b
    # and matches the scalar-math recompute per element
    for i in range(len(counts)):
        assert lw[i] == math.floor(math.log(counts[i] / total) * 1e9 + 0.5)
