"""Entity-match parity tests (FIXTURES.md F2): the reference's golden search
semantics — exact/typo/nickname/short-name/negative cases with score RANGES
(reference asserts ranges, not exact floats: fuzzy_search_cases.json), plus
OCR variants, tombstone removal and TTL expiry."""

import pandas as pd
import pyarrow as pa
import pytest

from fuzzy_matcher_ray.config import EntityMatchConfig
from fuzzy_matcher_ray.sources.persons import members_table, queries_table

CFG = EntityMatchConfig()


@pytest.fixture(scope="module")
def index_ds(ray_session):
    import ray.data as rd
    return rd.from_arrow(members_table())


def _match(index_ds, cases, cfg=CFG) -> pd.DataFrame:
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.entity_match import match_entities
    q = rd.from_arrow(queries_table(cases))
    return match_entities(index_ds, q, cfg).to_pandas()


def _best(df, qid):
    if len(df) == 0 or "query_id" not in df.columns:
        return None
    rows = df[df.query_id == qid]
    if len(rows) == 0:
        return None
    return rows.sort_values("rnk").iloc[0]


def test_exact_typo_nickname_negative(index_ds):
    df = _match(index_ds, [
        (0, "John", "Smith", "1985-03-15"),        # exact → #1, high score
        (1, "Jon", "Smith", "1985-03-15"),         # typo → #1
        (2, "Ben", "Anderson", "1986-08-08"),      # nickname prefix → #9
        (3, "Xyz", "Nonexistent", "1955-01-01"),   # negative → none
        (4, "John", "Smith", "1999-12-31"),        # wrong exact birthdate → none
    ])
    b0 = _best(df, 0)
    assert b0 is not None and b0.rec_id == 1 and 0.95 <= b0.score <= 1.0
    b1 = _best(df, 1)
    assert b1 is not None and b1.rec_id == 1 and 0.85 <= b1.score <= 0.999
    b2 = _best(df, 2)
    assert b2 is not None and b2.rec_id == 9 and 0.6 <= b2.score <= 1.0
    assert _best(df, 3) is None
    assert _best(df, 4) is None     # exact-method field mismatch ⇒ reject


def test_short_names_exact_only(index_ds):
    # short names (avg <= 3.5) take the exact tier: no fuzzy expansion
    # (≙ short_name_validation_tests.json / example_source.go:28-39)
    df = _match(index_ds, [(0, "Al", "Li", "1985-03-15")])
    assert _best(df, 0) is None


def test_ocr_variant_matches(index_ds):
    # srnith → smith (rn→m digram, recurse.go:34-41);
    # j0hn → john (0→o digit fold)
    df = _match(index_ds, [(0, "J0hn", "Srnith", "1985-03-15")])
    b = _best(df, 0)
    assert b is not None and b.rec_id == 1 and b.score >= 0.8


def test_same_firstname_disambiguation(index_ds):
    # John Williams (#2) must not lose to John Smith (#1) on its own query
    df = _match(index_ds, [(0, "John", "Williams", "1978-11-02")])
    b = _best(df, 0)
    assert b is not None and b.rec_id == 2 and b.score >= 0.95


def test_topk_ordering(index_ds):
    df = _match(index_ds, [(0, "John", "Smith", "1985-03-15")])
    g = df[df.query_id == 0].sort_values("rnk")
    assert (g.score.values[:-1] >= g.score.values[1:]).all()
    assert len(g) <= CFG.top_k


def test_removal_tombstones(index_ds, ray_session):
    # ≙ remove_entries_test_data.json: remove #1 → absent, sibling #2 found
    import ray.data as rd
    from fuzzy_matcher_ray.state.tombstones import remove_ids
    tombs = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64())}))
    pruned = remove_ids(index_ds, tombs, key="id")
    df = _match(pruned, [
        (0, "John", "Smith", "1985-03-15"),
        (1, "John", "Williams", "1978-11-02"),
    ])
    b0 = _best(df, 0)
    assert b0 is None or b0.rec_id != 1
    b1 = _best(df, 1)
    assert b1 is not None and b1.rec_id == 2 and b1.score > 0.8


def test_ttl_expiry(index_ds, ray_session):
    # entries whose valid_until passed are excluded (clean.go:29-51 as filter)
    import numpy as np
    from fuzzy_matcher_ray.state.tombstones import filter_expired
    far_future = np.datetime64("2030-01-01T00:00:00", "us")
    all_expired = filter_expired(index_ds, far_future)
    df = _match(all_expired, [(0, "John", "Smith", "1985-03-15")])
    assert _best(df, 0) is None
    past = np.datetime64("2020-01-01T00:00:00", "us")
    none_expired = filter_expired(index_ds, past)
    df2 = _match(none_expired, [(0, "John", "Smith", "1985-03-15")])
    assert _best(df2, 0).rec_id == 1


def test_ttl_validation_invariant(ray_session):
    # ≙ Build error on zero expiry when UseExpiration
    # (fuzzy_matcher_core.go:85-95): ttl_mode rejects null/epoch valid_until
    import numpy as np
    import ray
    import ray.data as rd

    from fuzzy_matcher_ray.state.tombstones import (
        TtlValidationError, filter_expired, validate_ttl)
    good = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "valid_until": pa.array(
            [np.datetime64("2030-01-01T00:00:00", "us"),
             np.datetime64("2031-01-01T00:00:00", "us")])})
    assert validate_ttl(rd.from_arrow(good)).count() == 2
    bad = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "valid_until": pa.array(
            [np.datetime64("2030-01-01T00:00:00", "us"), None])})
    with pytest.raises((TtlValidationError, ray.exceptions.RayTaskError,
                        Exception)) as ei:
        filter_expired(rd.from_arrow(bad),
                       np.datetime64("2020-01-01T00:00:00", "us"),
                       ttl_mode=True).count()
    assert "ttl_mode" in str(ei.value)
    # missing column under ttl_mode also fails
    nocol = pa.table({"id": pa.array([1], pa.int64())})
    with pytest.raises(Exception) as ei2:
        validate_ttl(rd.from_arrow(nocol)).count()
    assert "valid_until" in str(ei2.value)
