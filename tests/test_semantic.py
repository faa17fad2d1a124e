"""SemDeDup semantic-dedup oracles.

The pipeline's cross-batch arithmetic is int64 fixed point by design, so
the pure-numpy driver twin here must match the distributed run EXACTLY
(centroids, assignments, kept sets) — any drift is a real bug, not float
noise. The greedy-prune invariants are checked directly on the output:
no kept same-cluster pair at or above eps, and every pruned member is
within eps of some kept member of its cluster (greedy cover property).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"
K, ITERS, SEED, EPS = 10, 4, 7, 0.4


def _load():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    return ids, mat


def _driver_kmeans(ids, mat, k=K, iters=ITERS, seed=SEED):
    """Pure-numpy twin of kmeans_fit: same sample, same init, same exact
    int64 Lloyd updates — must equal the distributed fit bit-for-bit."""
    from fuzzy_matcher_ray.functions.shingle import splitmix64
    from fuzzy_matcher_ray.pipelines.semantic import (
        _FP, _assign_fp, _fp_rows, _gonzalez_init)

    cap = max(64 * k, 1024)
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    sel = np.argsort(h, kind="stable")[:cap]
    x = _fp_rows(mat)
    c_fp = _gonzalez_init(ids[sel], x[sel], min(k, len(sel)))
    for _ in range(iters):
        a = _assign_fp(x, c_fp)
        new = c_fp.copy()
        for cid in range(len(c_fp)):
            members = x[a == cid]
            if len(members):
                mean = members.sum(axis=0, dtype=np.int64).astype(
                    np.float64) / (len(members) * float(_FP))
                new[cid] = _fp_rows(mean[None, :])[0]
        c_fp = new
    return c_fp, x


@pytest.fixture(scope="module")
def fitted(ray_session):
    from fuzzy_matcher_ray.pipelines import semantic
    ids, mat = _load()
    c_driver, x = _driver_kmeans(ids, mat)
    c_dist = semantic.kmeans_fit(semantic._read(SF_DIR), k=K, iters=ITERS,
                                 seed=SEED)
    return ids, mat, x, c_driver, c_dist


def test_kmeans_matches_driver_twin(fitted):
    _, _, _, c_driver, c_dist = fitted
    assert c_dist.shape == c_driver.shape
    assert np.array_equal(c_dist, c_driver)          # exact, not allclose


def test_semantic_clusters_match_driver_assignment(fitted, ray_session):
    from fuzzy_matcher_ray.pipelines.semantic import (
        _assign_fp, _cos6_from_dot, semantic_clusters)
    ids, _, x, c_driver, _ = fitted
    out = semantic_clusters(SF_DIR, k=K, iters=ITERS, seed=SEED).to_pandas()
    assert list(out.columns) == ["vec_id", "cluster_id", "cent_cosine"]
    assert np.array_equal(out["vec_id"].to_numpy(), np.sort(ids))
    order = np.argsort(ids, kind="stable")
    a = _assign_fp(x, c_driver)
    dots = (x @ c_driver.T)[np.arange(len(a)), a]
    assert np.array_equal(out["cluster_id"].to_numpy(), a[order])
    assert np.array_equal(out["cent_cosine"].to_numpy(),
                          _cos6_from_dot(dots[order]))


def _driver_prune(ids, x, a, dots, eps_int):
    kept_mask = np.zeros(len(ids), dtype=bool)
    for cid in np.unique(a):
        gi = np.flatnonzero(a == cid)
        order = gi[np.lexsort((ids[gi], -dots[gi]))]
        kept: list[int] = []
        for i in order:
            if not kept or int((x[kept] @ x[i]).max()) < int(eps_int):
                kept.append(int(i))
        kept_mask[np.array(kept, dtype=np.int64)] = True
    return kept_mask


def test_semdedup_matches_bruteforce_and_invariants(fitted, ray_session):
    from fuzzy_matcher_ray.pipelines.semantic import (
        _DOT_SCALE, _assign_fp, semdedup_prune)
    ids, _, x, c_driver, _ = fitted
    out = semdedup_prune(SF_DIR, k=K, iters=ITERS, eps=EPS,
                         seed=SEED).to_pandas()
    assert list(out.columns) == ["vec_id", "cluster_id"]

    a = _assign_fp(x, c_driver)
    dots = (x @ c_driver.T)[np.arange(len(a)), a]
    eps_int = np.int64(np.rint(EPS * _DOT_SCALE))
    kept_mask = _driver_prune(ids, x, a, dots, eps_int)

    # exact parity with the greedy oracle (set AND cluster assignment)
    expect = sorted(zip(ids[kept_mask].tolist(), a[kept_mask].tolist()))
    got = list(zip(out["vec_id"].tolist(), out["cluster_id"].tolist()))
    assert got == expect
    assert 0 < len(got) < len(ids)        # non-vacuous: something pruned

    # invariant 1: no kept same-cluster pair at/above eps
    pos = {int(v): i for i, v in enumerate(ids)}
    for cid in np.unique(a):
        ki = np.array([pos[v] for v, c in got if c == cid], dtype=np.int64)
        if len(ki) > 1:
            g = x[ki] @ x[ki].T
            np.fill_diagonal(g, 0)
            assert g.max() < int(eps_int)
    # invariant 2 (greedy cover): every pruned member is >= eps-close to a
    # kept member of its own cluster
    for i in np.flatnonzero(~kept_mask):
        ki = np.flatnonzero(kept_mask & (a == a[i]))
        assert len(ki) and int((x[ki] @ x[i]).max()) >= int(eps_int)


def test_kmeans_iterations_improve_objective(ray_session):
    """Lloyd on exact arithmetic: the mean best-dot after iterating must
    beat (or match, minus fixed-point snap slack) the init assignment."""
    from fuzzy_matcher_ray.pipelines import semantic
    ids, mat = _load()
    x = semantic._fp_rows(mat)
    c0, _ = _driver_kmeans(ids, mat, iters=0)
    c4 = semantic.kmeans_fit(semantic._read(SF_DIR), k=K, iters=ITERS,
                             seed=SEED)
    m0 = (x @ c0.T).max(axis=1).mean()
    m4 = (x @ c4.T).max(axis=1).mean()
    assert m4 >= m0 - 1e-6 * float(semantic._DOT_SCALE)
    assert m4 > m0                      # and strictly better on this corpus


def test_greedy_kept_blocked_matches_naive_loop():
    """The vectorized blocked-dominance kernel is byte-identical to the
    per-member greedy loop, across block boundaries and dup densities."""
    from fuzzy_matcher_ray.pipelines.semantic import _FP, _greedy_kept

    def _naive(xs, eps_int):
        kept: list[int] = []
        for i in range(len(xs)):
            if not kept or int((xs[kept] @ xs[i]).max()) < int(eps_int):
                kept.append(i)
        return np.array(kept, dtype=np.int64)

    rng = np.random.RandomState(3)
    for n, dim, dup_groups in [(0, 8, 0), (1, 8, 0), (37, 8, 5),
                               (200, 16, 12), (513, 4, 3), (257, 8, 257)]:
        if dup_groups:
            base = rng.randn(dup_groups, dim)
            m = base[rng.randint(0, dup_groups, size=n)] \
                + rng.randn(n, dim) * 0.05
        else:
            m = rng.randn(max(n, 1), dim)[:n]
        if n:
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
        xs = np.rint(m * float(_FP)).astype(np.int64).reshape(n, dim)
        for eps in (0.5, 0.9, 0.99):
            eps_int = np.int64(np.rint(eps * float(_FP) * float(_FP)))
            for block in (4, 64, 1024):
                got = _greedy_kept(xs, eps_int, block=block)
                assert got.tolist() == _naive(xs, eps_int).tolist(), \
                    (n, dim, dup_groups, eps, block)


def _boundary_fixture(tmp_path):
    """Two tight blobs + a planted near-identical pair straddling the
    k-means boundary (each member lands in a different cluster)."""
    import pyarrow as pa
    rng = np.random.RandomState(5)
    e1 = np.array([1.0, 0.0, 0.0]); e2 = np.array([0.0, 1.0, 0.0])
    rows = []
    for base in (e1, e2):
        pts = base + rng.randn(50, 3) * 0.02
        rows.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    m = (e1 + e2) / np.linalg.norm(e1 + e2)
    v1 = m + 0.03 * e1; v2 = m + 0.03 * e2
    rows.append(np.stack([v1 / np.linalg.norm(v1), v2 / np.linalg.norm(v2)]))
    mat = np.concatenate(rows).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel()), 3).cast(pa.list_(pa.float32()))
    pq.write_table(pa.table({"vec_id": pa.array(ids), "embedding": emb}),
                   str(tmp_path / "embeddings.parquet"))
    return str(tmp_path), 100, 101      # dir, planted pair ids


def test_boundary_backstop_catches_cross_cluster_dups(ray_session, tmp_path):
    from fuzzy_matcher_ray.pipelines.semantic import (semdedup_prune,
                                                      semdedup_prune_boundary)
    sf, a, b = _boundary_fixture(tmp_path)
    plain = semdedup_prune(sf, k=2, iters=4, eps=0.9, seed=7).to_pandas()
    # the pair straddles the boundary: plain per-cluster prune misses it
    plain_ids = set(plain.vec_id)
    assert {a, b} <= plain_ids
    assert plain.loc[plain.vec_id == a, "cluster_id"].iloc[0] != \
        plain.loc[plain.vec_id == b, "cluster_id"].iloc[0]

    boosted = semdedup_prune_boundary(sf, k=2, iters=4, eps=0.9, seed=7,
                                      delta=0.05).to_pandas()
    boosted_ids = set(boosted.vec_id)
    # exactly one of the planted pair is pruned by the backstop
    assert len({a, b} & boosted_ids) == 1
    # and nothing else changed: backstop only removes, never adds
    assert boosted_ids <= plain_ids
    assert plain_ids - boosted_ids <= {a, b}


def test_boundary_backstop_delta_zero_is_plain_prune(ray_session, tmp_path):
    from fuzzy_matcher_ray.pipelines.semantic import (semdedup_prune,
                                                      semdedup_prune_boundary)
    sf, _, _ = _boundary_fixture(tmp_path)
    plain = semdedup_prune(sf, k=2, iters=4, eps=0.9, seed=7).to_pandas()
    zero = semdedup_prune_boundary(sf, k=2, iters=4, eps=0.9, seed=7,
                                   delta=0.0).to_pandas()
    assert plain.values.tolist() == zero.values.tolist()
