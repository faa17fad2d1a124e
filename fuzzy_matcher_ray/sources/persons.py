"""Person-record fixture (FIXTURES.md F2): a small member table with the
same *shape* as the reference's example corpus (20 members, firstname /
surname / birthdate / event window), synthesized here — used by the
entity-match parity tests (exact, typo, nickname, short-name, negative,
removal, TTL scenarios mirroring fuzzy_search_cases.json /
nickname_tests.json / edge_case_tests.json / remove_entries_test_data.json).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MEMBERS = [
    # (id, firstname, surname, birthdate)
    (1, "John", "Smith", "1985-03-15"),
    (2, "John", "Williams", "1978-11-02"),
    (3, "Sarah", "Johnson", "1990-07-21"),
    (4, "Michael", "Brown", "1982-01-30"),
    (5, "Emily", "Davis", "1995-09-12"),
    (6, "David", "Miller", "1971-05-05"),
    (7, "Jessica", "Wilson", "1988-12-25"),
    (8, "Daniel", "Moore", "1992-04-18"),
    (9, "Benjamin", "Anderson", "1986-08-08"),
    (10, "Olivia", "Taylor", "1993-02-14"),
    (11, "William", "Thomas", "1980-10-09"),
    (12, "Sophia", "Jackson", "1991-06-27"),
    (13, "James", "White", "1975-03-03"),
    (14, "Isabella", "Harris", "1994-11-19"),
    (15, "Alexander", "Martin", "1983-07-07"),
    (16, "Mia", "Thompson", "1996-01-23"),
    (17, "Ethan", "Garcia", "1987-09-30"),
    (18, "Charlotte", "Martinez", "1989-05-16"),
    (19, "Jacob", "Robinson", "1979-12-01"),
    (20, "Amelia", "Clark", "1997-04-04"),
]


def members_table(ttl_hours: float = 12.0) -> pa.Table:
    """The member index table; expiry = event_end + ttl (example_source.go:118)."""
    base = np.datetime64("2024-06-01T10:00:00", "us")
    ids, first, sur, bd = zip(*_MEMBERS)
    event_end = base + np.arange(len(ids)) * np.timedelta64(3600_000_000, "us")
    valid_until = event_end + np.timedelta64(int(ttl_hours * 3600e6), "us")
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "firstname": pa.array(first, pa.string()),
        "surname": pa.array(sur, pa.string()),
        "birthdate": pa.array(bd, pa.string()),
        "event_end_utc": pa.array(event_end),
        "valid_until": pa.array(valid_until),
    })


def queries_table(cases: list[tuple[int, str, str, str]]) -> pa.Table:
    """(query_id, firstname, surname, birthdate) probe table."""
    qid, first, sur, bd = zip(*cases)
    return pa.table({
        "query_id": pa.array(qid, pa.int64()),
        "firstname": pa.array(first, pa.string()),
        "surname": pa.array(sur, pa.string()),
        "birthdate": pa.array(bd, pa.string()),
    })


def example_search_parameters(firstname: str, surname: str,
                              birthdate: str) -> dict:
    """Per-record dynamic search parameters — ≙ ExampleSource
    GetSearchParameters + ValidateEntry (example_source.go:20-101): short
    names (avg(len(first), len(sur)) <= 3.5 after trim+lower) or any missing
    required field force MaxDepth/MaxEdits of 0 on every field (exact-only
    tier); valid records get the fuzzy budgets. Weights / methods /
    min-distances are static.

    The pipeline analogue: a ``max_edits`` column on the query table —
    ``min(max_edits.values())`` per record — consumed by
    ``pipelines.entity_match`` (0 ⇒ exact-only row tier).
    """
    fn = firstname.strip().lower()
    sn = surname.strip().lower()
    valid = bool(fn) and bool(sn) and bool(birthdate) \
        and (len(fn) + len(sn)) / 2.0 > 3.5
    budgets = {"firstname": 6, "surname": 2, "birthdate": 2} if valid else \
        {"firstname": 0, "surname": 0, "birthdate": 0}
    return {
        "max_depth": dict(budgets),
        "max_edits": dict(budgets),
        "weights": {"firstname": 0.2, "surname": 0.4, "birthdate": 0.4},
        "calculation_methods": {"firstname": "jaro_winkler",
                                "surname": "jaro_winkler",
                                "birthdate": "exact"},
        "min_distances": {"firstname": 0.7, "surname": 0.9, "birthdate": 1.0},
    }
