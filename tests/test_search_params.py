"""Per-record dynamic search parameters + OCR-correction parity tests.

- Golden cases from the reference's own data file
  ``/root/reference/tests/test_data/short_name_validation_tests.json``
  (loaded read-only at test time, not copied): short names force
  MaxDepth/MaxEdits = 0 on every field (≙ example_members_test.go:226-304).
- Per-row ``max_edits`` column semantics in the entity-match pipeline
  (≙ GetSearchParameters, example_source.go:20-81).
- Exact-tier enforcement on the INDEX side: a short-record index entry never
  fuzzy-matches (exact-only rule), even when blocking keys collide.
- OCR multi-char + mixed swap end-to-end cases
  (≙ /root/reference/tests/ocr_multichar_test.go:14-55).
- Verify-time confusable substitution discount (recurse.go:7-32 pairs).
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fuzzy_matcher_ray.config import EntityMatchConfig, FieldParams
from fuzzy_matcher_ray.functions.normalize import confusable_table
from fuzzy_matcher_ray.functions.similarity import levenshtein_batch
from fuzzy_matcher_ray.sources.persons import (
    example_search_parameters, members_table, queries_table)

_GOLDEN = "/root/reference/tests/test_data/short_name_validation_tests.json"


# ---------------------------------------------------------------------------
# Golden: GetSearchParameters short-name rule (reference's own test data)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(_GOLDEN), reason="reference data absent")
def test_short_name_validation_golden():
    with open(_GOLDEN) as f:
        cases = json.load(f)["test_cases"]
    assert len(cases) >= 7
    for case in cases:
        m = case["member"]
        params = example_search_parameters(
            m["firstname"], m["surname"], m["birthdate"])
        assert params["max_depth"] == case["expected_max_depth"], case["name"]
        assert params["max_edits"] == case["expected_max_edits"], case["name"]


def test_search_parameters_static_maps():
    p = example_search_parameters("John", "Smith", "1985-03-15")
    assert abs(sum(p["weights"].values()) - 1.0) < 1e-9
    assert p["calculation_methods"]["birthdate"] == "exact"
    assert p["min_distances"] == {"firstname": 0.7, "surname": 0.9,
                                  "birthdate": 1.0}
    # whitespace is trimmed before the length rule (strings.TrimSpace)
    assert example_search_parameters("  Jo  ", " Li ", "1990-05-15")[
        "max_edits"]["firstname"] == 0


# ---------------------------------------------------------------------------
# Pipeline: per-row max_edits column ≙ per-record dynamic parameters
# ---------------------------------------------------------------------------

def _match(index_tbl, q_tbl, cfg=None) -> pd.DataFrame:
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.entity_match import match_entities
    return match_entities(rd.from_arrow(index_tbl), rd.from_arrow(q_tbl),
                          cfg or EntityMatchConfig()).to_pandas()


def _best(df, qid):
    if len(df) == 0 or "query_id" not in df.columns:
        return None
    rows = df[df.query_id == qid]
    return None if len(rows) == 0 else rows.sort_values("rnk").iloc[0]


def test_per_record_max_edits_zero_forces_exact(ray_session):
    # same typo query twice: default budget matches, max_edits=0 must not
    q = queries_table([(0, "Jon", "Smith", "1985-03-15"),
                       (1, "Jon", "Smith", "1985-03-15")])
    q = q.append_column("max_edits", pa.array([4, 0], pa.int64()))
    df = _match(members_table(), q)
    assert _best(df, 0) is not None and _best(df, 0).rec_id == 1
    assert _best(df, 1) is None

    # exact query with max_edits=0 still matches (equality passes exact tier)
    q2 = queries_table([(0, "John", "Smith", "1985-03-15")])
    q2 = q2.append_column("max_edits", pa.array([0], pa.int64()))
    df2 = _match(members_table(), q2)
    b = _best(df2, 0)
    assert b is not None and b.rec_id == 1 and b.score >= 0.99


def test_per_record_budget_caps_edits(ray_session):
    # two-field typo costs 2 edits; a per-row budget of 1 rejects it while
    # the global default (4) accepts
    q = queries_table([(0, "Johhn", "Smiith", "1985-03-15"),
                       (1, "Johhn", "Smiith", "1985-03-15")])
    q = q.append_column("max_edits", pa.array([4, 1], pa.int64()))
    df = _match(members_table(), q)
    assert _best(df, 0) is not None and _best(df, 0).rec_id == 1
    assert _best(df, 1) is None


# ---------------------------------------------------------------------------
# Exact-tier enforcement on the index side (short-record exact-only rule)
# ---------------------------------------------------------------------------

def test_exact_tier_index_never_fuzzy_matches(ray_session):
    # index record "Lin / Wun" is exact-tier (avg len 3 <= 3.5); the fuzzy
    # query "Lina / Wung" scores jw ≈ 0.94 against it on both names — above
    # every threshold — and shares its birthdate blocking key, yet the
    # exact-only rule must reject it (reference: short records are
    # exact-match only, whichever side of the search they are on)
    idx = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "firstname": pa.array(["Lin", "Lina"], pa.string()),
        "surname": pa.array(["Wun", "Wung"], pa.string()),
        "birthdate": pa.array(["1990-05-15", "1990-05-15"], pa.string()),
    })
    q = queries_table([(0, "Lina", "Wung", "1990-05-15")])
    df = _match(idx, q)
    rows = df[df.query_id == 0] if len(df) else df
    matched = set(rows.rec_id) if len(rows) else set()
    assert 1 not in matched          # exact-tier index record: no fuzzy match
    assert 2 in matched              # the equal fuzzy record still matches
    # identical short query DOES match the exact-tier record
    q2 = queries_table([(0, "Lin", "Wun", "1990-05-15")])
    df2 = _match(idx, q2)
    b = _best(df2, 0)
    assert b is not None and b.rec_id == 1


# ---------------------------------------------------------------------------
# OCR multi-char / mixed swaps e2e (ocr_multichar_test.go:14-55)
# ---------------------------------------------------------------------------

_OCR_CASES = [
    # (search firstname, target firstname)
    ("srnith", "smith"),                                   # rn→m
    ("srnithsrnith", "smithsmith"),                        # 2 × rn→m
    ("srnithsrnithsrnithsrnithsrnith",
     "smithsmithsmithsmithsmith"),                         # extreme: 5 × rn→m
    ("jonnson", "jomson"),                                 # nn→m
    ("clown", "down"),                                     # cl→d
    ("dovvn", "down"),                                     # vv→w
    ("jonnath4n", "jonathan"),                             # nn→m + 4→a mixed
]


def test_ocr_multichar_swaps_e2e(ray_session):
    idx = pa.table({
        "id": pa.array(list(range(1, len(_OCR_CASES) + 1)), pa.int64()),
        "firstname": pa.array([t for _, t in _OCR_CASES], pa.string()),
        "surname": pa.array(["Tester"] * len(_OCR_CASES), pa.string()),
        "birthdate": pa.array(["1990-01-01"] * len(_OCR_CASES), pa.string()),
    })
    q = queries_table([(i, s, "Tester", "1990-01-01")
                       for i, (s, _) in enumerate(_OCR_CASES)])
    df = _match(idx, q)
    for i, (s, t) in enumerate(_OCR_CASES):
        b = _best(df, i)
        assert b is not None, f"no match for OCR variant {s!r} → {t!r}"
        # targets are not unique ("down" appears twice) — accept any record
        # carrying this case's target text (ties break by rec_id)
        ok_ids = {j + 1 for j, (_, tj) in enumerate(_OCR_CASES) if tj == t}
        assert b.rec_id in ok_ids, f"{s!r} matched wrong target"
        assert b.score >= 0.8


def test_confusable_discount_kernel():
    # c↔e is a single-char confusable (recurse.go:23/28): with cost 0 the
    # substitution is free; with default cost it is a full edit
    ct = confusable_table()
    assert levenshtein_batch(["cecil"], ["eecil"], ct, 0.0)[0] == 0.0
    assert levenshtein_batch(["cecil"], ["eecil"], ct, 0.5)[0] == 0.5
    assert levenshtein_batch(["cecil"], ["eecil"])[0] == 1.0
    # non-confusable substitution always costs 1 even with the table
    assert levenshtein_batch(["cat"], ["bat"], ct, 0.0)[0] == 1.0


def test_confusable_discount_pipeline(ray_session):
    # surname min_similarity is 0.9 (levenshtein method here): a single
    # confusable swap in a 5-char name scores 0.8 — rejected at parity cost,
    # accepted when the confusable discount halves the damage
    fields = {
        "firstname": FieldParams(0.2, "jaro_winkler", 0.7, 2),
        "surname": FieldParams(0.4, "levenshtein", 0.9, 2),
        "birthdate": FieldParams(0.4, "exact", 1.0, 0),
    }
    idx = pa.table({
        "id": pa.array([1], pa.int64()),
        "firstname": pa.array(["gregor"], pa.string()),
        "surname": pa.array(["cerny"], pa.string()),   # e-for-c misread: eerny
        "birthdate": pa.array(["1970-02-03"], pa.string()),
    })
    q = queries_table([(0, "gregor", "eerny", "1970-02-03")])
    strict = EntityMatchConfig(fields=fields, ocr_confusable_cost=1.0)
    df = _match(idx, q, strict)
    assert _best(df, 0) is None          # 1 - 1/5 = 0.8 < 0.9 ⇒ reject
    lenient = EntityMatchConfig(fields=fields, ocr_confusable_cost=0.25)
    df2 = _match(idx, q, lenient)
    b = _best(df2, 0)
    assert b is not None and b.rec_id == 1   # 1 - 0.25/5 = 0.95 >= 0.9


def test_search_parameters_drive_pipeline(ray_session):
    """GetSearchParameters → max_edits column → pipeline: the golden rule's
    exact-only tier end-to-end (short query with a typo finds nothing; the
    same typo on a long name matches)."""
    cases = [(0, "Jon", "Smith", "1985-03-15"),    # long ⇒ fuzzy ⇒ match
             (1, "Ali", "Wu", "1985-03-15")]       # short ⇒ exact ⇒ no match
    q = queries_table(cases)
    budgets = [min(example_search_parameters(f, s, b)["max_edits"].values())
               for _, f, s, b in cases]
    q = q.append_column("max_edits", pa.array(budgets, pa.int64()))
    idx = members_table()
    idx_plus = pa.table({
        "id": pa.concat_arrays([idx["id"].combine_chunks(),
                                pa.array([99], pa.int64())]),
        "firstname": pa.concat_arrays([idx["firstname"].combine_chunks(),
                                       pa.array(["Ali"], pa.string())]),
        "surname": pa.concat_arrays([idx["surname"].combine_chunks(),
                                     pa.array(["Wun"], pa.string())]),
        "birthdate": pa.concat_arrays([idx["birthdate"].combine_chunks(),
                                       pa.array(["1985-03-15"], pa.string())]),
    })
    df = _match(idx_plus, q)
    assert _best(df, 0) is not None and _best(df, 0).rec_id == 1
    assert _best(df, 1) is None     # exact tier: "Wu" != "Wun"


def test_row_max_edits_int32_column():
    """An int32 max_edits column must not crash fill_null with the int64
    sentinel (pc.fill_null can't widen the fill value)."""
    import numpy as np
    import pyarrow as pa

    from fuzzy_matcher_ray.pipelines.entity_match import _row_max_edits
    batch = pa.table({"max_edits": pa.array([1, None, 3], pa.int32())})
    out = _row_max_edits(batch, "max_edits", 3)
    assert out.dtype == np.int64
    assert out[0] == 1 and out[1] == 2 ** 31 and out[2] == 3
