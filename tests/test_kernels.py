"""Pure-kernel unit tests (no Ray): normalize, similarity, minhash, simhash,
suffix arrays, fingerprints, union-find. These define parity with the
reference (SURVEY.md §5, FIXTURES.md F3)."""

import numpy as np
import pyarrow as pa
import pytest

from fuzzy_matcher_ray.functions import normalize as nz
from fuzzy_matcher_ray.functions import similarity as sim
from fuzzy_matcher_ray.functions.fingerprint import content_hash, winnow_batch
from fuzzy_matcher_ray.functions.minhash import (
    EMPTY_SIG, band_hashes, minhash_signatures, perm_params)
from fuzzy_matcher_ray.functions.shingle import (
    counts_to_offsets, shingle_batch, unique_per_doc)
from fuzzy_matcher_ray.functions.simhash import (
    hamming64, simhash_batch, simhash_combo_keys)
from fuzzy_matcher_ray.functions.suffix import lcp_array, long_repeat_pairs, suffix_array
from fuzzy_matcher_ray.functions.unionfind import connected_components


# ---------------- normalize (normalize.go:9-15 parity, F3 goldens) ----------

@pytest.mark.parametrize("raw,expected", [
    ("John  O'Brien-2", "johnobrien2"),
    ("  HELLO, World!! 42 ", "helloworld42"),
    ("", ""),
    ("---", ""),
    ("MiXeD123", "mixed123"),
])
def test_normalize_scalar(raw, expected):
    assert nz.normalize_text(raw) == expected


def test_normalize_array_matches_scalar():
    vals = ["John  O'Brien-2", "", "A b C", "x!y?z", "ÄÖÜ test"]  # unicode dropped
    arr = nz.normalize_array(pa.array(vals))
    assert arr.to_pylist() == [nz.normalize_text(v) for v in vals]


def test_fold_confusables():
    assert nz.fold_confusables("srnith") == "smith"
    # jonnath4n: nn→m, 4→a — one n/m mismatch vs jonathan remains (scored fuzzily)
    assert nz.fold_confusables("jonnath4n") == "jomathan"
    assert nz.fold_confusables("jonathan") == "jonathan"
    assert sim.levenshtein(nz.fold_confusables("jonnath4n"), "jonathan") <= 1
    arr = nz.fold_array(pa.array(["srnith", "vvilliam", "cl0ck", "b4d1"]))
    assert arr.to_pylist() == ["smith", "william", "dock", "badl"]


# ---------------- similarity kernels (distance_tests.json ranges) -----------

@pytest.mark.parametrize("s1,s2,lo,hi", [
    ("john", "john", 0.999, 1.0),
    ("john", "xyz", 0.0, 0.1),
    ("john", "jon", 0.70, 1.0),
    ("smith", "smyth", 0.60, 1.0),
    ("", "", 0.0, 0.001),
    ("john", "", 0.0, 0.001),
])
def test_jaro_winkler_ranges(s1, s2, lo, hi):
    v = sim.jaro_winkler(s1, s2)
    assert lo <= v <= hi, (s1, s2, v)


def test_jaro_winkler_values():
    # classic textbook values (prefix-boosted)
    assert abs(sim.jaro("john", "jon") - 0.9166666) < 1e-5
    assert abs(sim.jaro_winkler("john", "jon", long_tolerance=False) - 0.93333) < 1e-4


@pytest.mark.parametrize("s1,s2,d", [
    ("hello", "hello", 0), ("hello", "hallo", 1), ("", "abc", 3),
    ("kitten", "sitting", 3), ("flaw", "lawn", 2), ("abc", "", 3),
])
def test_levenshtein(s1, s2, d):
    assert sim.levenshtein(s1, s2) == d


def test_levenshtein_norm():
    assert sim.levenshtein_norm("hello", "hello") == 1.0
    assert abs(sim.levenshtein_norm("hello", "hallo") - 0.8) < 1e-9
    assert sim.levenshtein_norm("", "") == 1.0


def test_similarity_dispatch_default_is_one():
    # distance.go:35-36 — Default method returns constant 1.0
    assert sim.similarity("anything", "else", "exact") == 1.0


# ---------------- shingles / minhash ----------------------------------------

def test_shingle_batch_basic():
    arr = pa.array(["abcdef", "abcde", "abcd", "xyz", ""])
    h, c = shingle_batch(arr, k=5)
    assert c.tolist() == [2, 1, 0, 0, 0]
    offs = counts_to_offsets(c)
    # same 5-gram in different docs hashes identically
    assert h[offs[0]] == h[offs[1]]          # "abcde" in doc0 and doc1
    assert h[0] != h[1]


def test_shingle_no_cross_doc_windows():
    # "ab"+"cde" must NOT produce the shingle of "abcde"
    joined, _ = shingle_batch(pa.array(["abcde"]), k=5)
    split, c = shingle_batch(pa.array(["ab", "cde"]), k=5)
    assert c.sum() == 0 and len(split) == 0 and len(joined) == 1


def test_unique_per_doc():
    arr = pa.array(["aaaaaa", "abcdeabcde"])
    h, c = unique_per_doc(*shingle_batch(arr, k=5))
    assert c.tolist() == [1, 5]  # "aaaaa" x2 → 1; 6 grams, 5 distinct


def test_minhash_deterministic_and_accurate():
    rng = np.random.default_rng(7)
    base = "".join(rng.choice(list("abcdefgh"), 500))
    variant = base[:250] + "XXXX" + base[250:]
    arr = pa.array([base, variant, base])
    h, c = shingle_batch(arr, k=5)
    a, b = perm_params(128, seed=1)
    sig = minhash_signatures(h, c, a, b)
    sig2 = minhash_signatures(*shingle_batch(arr, k=5), a, b)
    assert (sig == sig2).all()                       # deterministic
    assert (sig[0] == sig[2]).all()                  # identical docs
    uh, uc = unique_per_doc(h, c)
    offs = counts_to_offsets(uc)
    ua, ub = uh[offs[0]:offs[1]], uh[offs[1]:offs[2]]
    true_j = len(np.intersect1d(ua, ub)) / len(np.union1d(ua, ub))
    est = (sig[0] == sig[1]).mean()     # fraction of equal components
    assert abs(est - true_j) < 0.15                  # 128 perms ⇒ σ≈0.04
    empty_sig = minhash_signatures(*shingle_batch(pa.array(["ab"]), k=5), a, b)
    assert (empty_sig == EMPTY_SIG).all()


def test_band_hashes_collision_semantics():
    a, b = perm_params(128, seed=1)
    arr = pa.array(["abcdefghijklmnop" * 20, "abcdefghijklmnop" * 20, "zzzz" * 100])
    sig = minhash_signatures(*shingle_batch(arr, k=5), a, b)
    bh = band_hashes(sig, 16, 8)
    assert bh.shape == (3, 16)
    assert (bh[0] == bh[1]).all()
    assert not (bh[0] == bh[2]).any()


# ---------------- simhash ----------------------------------------------------

def test_simhash_near_and_far():
    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("abcdefghij"), 800))
    near = base[:400] + "q" + base[401:]
    far = "".join(rng.choice(list("abcdefghij"), 800))
    h, c = shingle_batch(pa.array([base, near, far]), k=5)
    s = simhash_batch(h, c)
    d_near = hamming64(s[0:1], s[1:2])[0]
    d_far = hamming64(s[0:1], s[2:3])[0]
    assert d_near <= 6 and d_far > 10
    keys, ncombo = simhash_combo_keys(s)
    assert keys.shape == (3, 20) and ncombo == 20
    if d_near <= 3:
        assert (keys[0] == keys[1]).any()            # pigeonhole guarantee
    assert not (keys[0] == keys[2]).any()            # far docs don't collide


# ---------------- suffix array / substring dedup -----------------------------

def test_suffix_array_banana():
    s = np.frombuffer(b"banana", dtype=np.uint8)
    sa = suffix_array(s)
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    lcp = lcp_array(s, sa)
    assert lcp.tolist() == [0, 1, 3, 0, 0, 2]


def test_long_repeat_pairs():
    shared = b"x" * 0 + bytes(range(65, 91)) * 10    # 260 distinct-ish bytes
    t1 = b"AAA" + shared + b"BBB"
    t2 = b"CCC" + shared + b"DDD"
    t3 = b"totally different content here" * 5
    a, b = long_repeat_pairs([t1, t2, t3], np.array([10, 20, 30]), min_len=200)
    assert set(zip(a.tolist(), b.tolist())) == {(10, 20)}


# ---------------- fingerprints -----------------------------------------------

def test_content_hash_properties():
    arr = pa.array(["abc", "abd", "abc", "", "acb", "ab", "abc "])
    h = content_hash(arr)
    assert h[0] == h[2]
    assert len(set(h.tolist())) == 6                 # all others distinct
    # deterministic across calls
    assert (content_hash(arr) == h).all()


def test_winnow_shared_substring_guarantee():
    rng = np.random.default_rng(11)
    shared = "".join(rng.choice(list("abcdefghijklmnop"), 300))
    d1 = "PREFIXONE" + shared + "SUFFIXONE"
    d2 = "zz" + shared + "qq"
    d3 = "".join(rng.choice(list("abcdefghijklmnop"), 300))
    fps, counts, positions = winnow_batch(pa.array([d1, d2, d3]), window=50, winnow=16)
    assert len(positions) == counts.sum()
    offs = counts_to_offsets(counts)
    f1 = set(fps[offs[0]:offs[1]].tolist())
    f2 = set(fps[offs[1]:offs[2]].tolist())
    f3 = set(fps[offs[2]:offs[3]].tolist())
    assert f1 & f2                                    # shared ≥ window+winnow-1
    assert not (f1 & f3)


# ---------------- union-find -------------------------------------------------

def test_connected_components():
    ea = np.array([1, 2, 10, 11, 5])
    eb = np.array([2, 3, 11, 12, 5])
    nodes, labels = connected_components(ea, eb, nodes=np.array([1, 2, 3, 5, 10, 11, 12, 99]))
    lab = dict(zip(nodes.tolist(), labels.tolist()))
    assert lab[1] == lab[2] == lab[3] == 1
    assert lab[10] == lab[11] == lab[12] == 10
    assert lab[5] == 5 and lab[99] == 99


def test_batched_kernels_match_scalar():
    """similarity.py batched padded-matrix kernels ≡ scalar kernels on
    randomized inputs (the entity-match verifier depends on exact parity)."""
    import random

    from fuzzy_matcher_ray.functions.similarity import (
        jaro_winkler, jaro_winkler_batch, levenshtein, levenshtein_batch,
        levenshtein_norm, levenshtein_norm_batch)
    rng = random.Random(17)
    alpha = "abcdefgh01"
    def rs():
        return "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 14)))
    a = [rs() for _ in range(500)] + ["", "john", "ben", "smith", "x"]
    b = [rs() for _ in range(500)] + ["", "john", "benjamin", "", "x"]
    jw = jaro_winkler_batch(a, b)
    lv = levenshtein_batch(a, b)
    ln = levenshtein_norm_batch(a, b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert abs(jaro_winkler(x, y) - jw[i]) < 1e-12, (x, y)
        assert abs(levenshtein(x, y) - lv[i]) < 1e-12, (x, y)
        assert abs(levenshtein_norm(x, y) - ln[i]) < 1e-12, (x, y)


def test_confusable_levenshtein_costs():
    import numpy as np

    from fuzzy_matcher_ray.functions.normalize import confusable_table
    from fuzzy_matcher_ray.functions.similarity import levenshtein_batch
    ct = confusable_table()
    # symmetric pairs from the reference table (recurse.go:7-32)
    assert ct[ord("c"), ord("e")] and ct[ord("e"), ord("c")]
    assert ct[ord("0"), ord("o")] and ct[ord("o"), ord("0")]
    assert not ct[ord("c"), ord("b")]
    d = levenshtein_batch(["vase", "abc"], ["uase", "xbc"], ct, 0.25)
    assert d[0] == 0.25          # v↔u confusable
    assert d[1] == 1.0           # a↔x is not


def test_tune_lsh_picks_config_default_at_flagship_threshold():
    """(bands, rows) = (16, 8) at 128 perms and threshold 0.8 — the
    BASELINE.json signature config must be the tuner's own optimum, and
    PipelineConfig must agree (drift in any of the three fails here)."""
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.functions.minhash import (lsh_collision_prob,
                                                     tune_lsh)
    cfg = PipelineConfig()
    b, r, diag = tune_lsh(cfg.jaccard_threshold, num_perms=cfg.num_perms)
    assert (b, r) == (cfg.bands, cfg.rows_per_band) == (16, 8)
    assert diag["p_at_threshold"] == lsh_collision_prob(0.8, 16, 8)
    assert diag["p_at_threshold"] > 0.9          # recall-side of the curve


def test_tune_lsh_monotone_and_bounds():
    """Higher thresholds prefer more rows per band (sharper curves
    further right); risk integrand areas are valid probabilities."""
    from fuzzy_matcher_ray.functions.minhash import tune_lsh
    rows_picked = [tune_lsh(t)[1] for t in (0.3, 0.5, 0.8, 0.9)]
    assert rows_picked == sorted(rows_picked)
    for t in (0.3, 0.9):
        b, r, d = tune_lsh(t)
        assert b * r == 128
        assert 0 <= d["fp_area"] <= 1 and 0 <= d["fn_area"] <= 1
    import pytest
    with pytest.raises(ValueError):
        tune_lsh(1.0)
