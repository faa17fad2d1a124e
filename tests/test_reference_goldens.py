"""The reference's OWN golden e2e corpora, run through the Ray entity-match
pipeline (parity with tests/distance_calculator_test.go:235-320 fuzzy
search, :402-471 edge cases, :484-566 nicknames).

Index = /root/reference/tests/test_data/example_members.json; per-case
queries/expectations from fuzzy_search_cases.json / nickname_tests.json /
edge_case_tests.json (loaded read-only at test time, not copied). Reference
harness config: CorrectOcrMisreads=false, MaxEdits=6, per-field params from
GetSearchParameters (jw/jw/default, weights .2/.4/.4, min dists .7/.9/1.0,
per-field MaxEdits 6/2/0-exact), top-5 truncation. Score assertions are
RANGES, exactly as the reference asserts them.
"""

import json
import os

import pyarrow as pa
import pytest

from fuzzy_matcher_ray.config import EntityMatchConfig, FieldParams

_DATA = "/root/reference/tests/test_data"

pytestmark = pytest.mark.skipif(not os.path.isdir(_DATA),
                                reason="reference test data absent")

# ≙ GetSearchParameters static maps + CoreParams MaxEdits=6, OCR off
_CFG = EntityMatchConfig(
    fields={
        "firstname": FieldParams(0.2, "jaro_winkler", 0.7, 6),
        "surname": FieldParams(0.4, "jaro_winkler", 0.9, 2),
        "birthdate": FieldParams(0.4, "exact", 1.0, 0),
    },
    global_max_edits=6, top_k=5, ocr_fold=False)


def _members_table() -> pa.Table:
    with open(f"{_DATA}/example_members.json") as f:
        members = json.load(f)["members"]
    return pa.table({
        "id": pa.array([int(m["id"]) for m in members], pa.int64()),
        "firstname": pa.array([m["firstname"] for m in members], pa.string()),
        "surname": pa.array([m["surname"] for m in members], pa.string()),
        "birthdate": pa.array([m["birthdate"] for m in members], pa.string()),
    })


def _run_cases(fname: str, ray_session):
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.entity_match import match_entities
    with open(f"{_DATA}/{fname}") as f:
        cases = json.load(f)["test_cases"]
    q_tbl = pa.table({
        "query_id": pa.array(range(len(cases)), pa.int64()),
        "firstname": pa.array([c["query"]["firstname"] for c in cases]),
        "surname": pa.array([c["query"]["surname"] for c in cases]),
        "birthdate": pa.array([c["query"]["birthdate"] for c in cases]),
    })
    out = match_entities(rd.from_arrow(_members_table()),
                         rd.from_arrow(q_tbl), _CFG).to_pandas()
    failures = []
    for qid, case in enumerate(cases):
        exp = case["expected"]
        rows = out[out.query_id == qid] if len(out) else out
        if not exp.get("should_find", True):
            if len(rows) != 0:
                failures.append(f"{case['name']}: expected no match, got "
                                f"{list(rows.rec_id)}")
            continue
        if len(rows) < exp.get("min_matches", 1):
            failures.append(f"{case['name']}: {len(rows)} matches < "
                            f"{exp.get('min_matches', 1)}")
            continue
        got = dict(zip(rows.rec_id, rows.score))
        for em in exp.get("expected_matches", []):
            mid = em["member_id"]
            if mid not in got:
                failures.append(f"{case['name']}: member {mid} not in "
                                f"top-{_CFG.top_k} {sorted(got)}")
                continue
            s = got[mid]
            if not (em.get("min_score", 0.0) - 1e-9 <= s
                    <= em.get("max_score", 1.0) + 1e-9):
                failures.append(
                    f"{case['name']}: member {mid} score {s:.3f} outside "
                    f"[{em.get('min_score', 0)}, {em.get('max_score', 1)}]")
    assert not failures, "\n".join(failures)


def test_fuzzy_search_cases_golden(ray_session):
    _run_cases("fuzzy_search_cases.json", ray_session)


def test_nickname_cases_golden(ray_session):
    _run_cases("nickname_tests.json", ray_session)


def test_edge_cases_golden(ray_session):
    _run_cases("edge_case_tests.json", ray_session)


def test_remove_entries_golden(ray_session):
    """≙ tests/integration_test.go:67-199 driven by
    remove_entries_test_data.json: sequential removals as tombstone
    anti-joins; removed ids unfindable, siblings still found."""
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.entity_match import match_entities
    from fuzzy_matcher_ray.state.tombstones import remove_ids
    with open(f"{_DATA}/remove_entries_test_data.json") as f:
        data = json.load(f)
    members = data["testMembers"]
    idx_tbl = pa.table({
        "id": pa.array([int(m["id"]) for m in members], pa.int64()),
        "firstname": pa.array([m["firstname"] for m in members]),
        "surname": pa.array([m["surname"] for m in members]),
        "birthdate": pa.array([m["birthdate"] for m in members]),
    })
    removed: list[int] = []
    failures = []
    for case in data["testCases"]:
        if "removalOp" in case:
            removed.extend(case["removalOp"]["removeIds"])
        index = rd.from_arrow(idx_tbl)
        if removed:
            tombs = rd.from_arrow(pa.table({
                "doc_id": pa.array(sorted(set(removed)), pa.int64())}))
            index = remove_ids(index, tombs, key="id")
        for qi, q in enumerate(case["queries"]):
            qm = q["queryMember"]
            q_tbl = pa.table({
                "query_id": pa.array([0], pa.int64()),
                "firstname": pa.array([qm["firstname"]]),
                "surname": pa.array([qm["surname"]]),
                "birthdate": pa.array([qm["birthdate"]]),
            })
            out = match_entities(index, rd.from_arrow(q_tbl), _CFG).to_pandas()
            got = set(out.rec_id) if len(out) else set()
            label = f"{case['name']}/{q['description']}"
            if q.get("expectedCount") == "zero":
                for mid in q.get("shouldNotFind", []):
                    if mid in got:
                        failures.append(f"{label}: removed id {mid} found")
            else:
                for mid in q.get("expectedIds", []):
                    if mid not in got:
                        failures.append(f"{label}: id {mid} not found ({got})")
            for mid in removed:
                if mid in got:
                    failures.append(f"{label}: tombstoned id {mid} resurfaced")
    assert not failures, "\n".join(failures)


def test_distance_tests_golden():
    """distance_tests.json: the reference's similarity-kernel golden ranges
    (≙ distance_calculator_test.go:148-192) — JaroWinkler / Levenshtein /
    Default (constant 1.0), expected ± delta, via the `similarity` dispatch
    registry (CalculationMethod parity)."""
    from fuzzy_matcher_ray.functions.similarity import similarity
    with open(f"{_DATA}/distance_tests.json") as f:
        data = json.load(f)
    method_of = {"jaro_winkler_tests": "jaro_winkler",
                 "levenshtein_tests": "levenshtein",
                 "default_tests": "exact"}
    failures = []
    for section, method in method_of.items():
        for case in data[section]:
            got = similarity(case["s1"], case["s2"], method)
            delta = case.get("delta", 0.0)   # default_tests: exact 1.0
            lo = case["expected"] - delta
            hi = case["expected"] + delta
            if not (lo - 1e-9 <= got <= hi + 1e-9):
                failures.append(f"{section}/{case['name']}: "
                                f"{got:.4f} outside [{lo}, {hi}]")
    assert not failures, "\n".join(failures)


def test_basic_tests_golden(ray_session):
    """basic_tests.json: the reference's smallest e2e corpus — exact match
    found with top score, typo'd query still finds the member, empty index
    finds nothing, and the normalized entry keys match validation_data
    (≙ CreateFuzzyEntry lowercase rule, example_source.go:104-120)."""
    import ray.data as rd

    from fuzzy_matcher_ray.functions.normalize import normalize_text
    from fuzzy_matcher_ray.pipelines.entity_match import match_entities
    with open(f"{_DATA}/basic_tests.json") as f:
        data = json.load(f)
    members = data["basic_test_members"]
    idx = pa.table({
        "id": pa.array([int(m["id"]) for m in members], pa.int64()),
        "firstname": pa.array([m["firstname"] for m in members]),
        "surname": pa.array([m["surname"] for m in members]),
        "birthdate": pa.array([m["birthdate"] for m in members]),
    })
    queries = data["test_queries"]

    def _q(name):
        q = queries[name]
        return pa.table({
            "query_id": pa.array([0], pa.int64()),
            "firstname": pa.array([q["firstname"]]),
            "surname": pa.array([q["surname"]]),
            "birthdate": pa.array([q["birthdate"]]),
        })

    exact = match_entities(rd.from_arrow(idx), rd.from_arrow(_q("exact_match")),
                           _CFG).to_pandas()
    assert 1 in set(exact.rec_id) and exact.score.max() >= 0.95
    fuzzy = match_entities(rd.from_arrow(idx), rd.from_arrow(_q("fuzzy_match")),
                           _CFG).to_pandas()
    assert 1 in set(fuzzy.rec_id)          # Jon/Smyth still finds John Smith
    empty_idx = idx.slice(0, 0)
    none = match_entities(rd.from_arrow(empty_idx),
                          rd.from_arrow(_q("empty_search")), _CFG).to_pandas()
    assert len(none) == 0                  # ≙ empty-trie negative
    keys = data["validation_data"]["fuzzy_entry_keys"]
    assert normalize_text(members[0]["firstname"]) == keys["firstname"]
    assert normalize_text(members[0]["surname"]) == keys["surname"]
