"""Perceptual image dedup: dHash kernel oracle, planted-cluster
recall/precision over the real decoders, and the cluster contract."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs_fixture(tmp_path, n_docs):
    tbl = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                    "text": pa.array(["x"] * n_docs, pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_box_mean_gray_exact():
    from fuzzy_matcher_ray.functions.media import box_mean_gray
    # 4×6 gray image, 2×3 cells of 2×2 px each — means are hand-checkable
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = box_mean_gray(g, 3, 2)
    exp = np.array([[(0 + 1 + 6 + 7) / 4, (2 + 3 + 8 + 9) / 4,
                     (4 + 5 + 10 + 11) / 4],
                    [(12 + 13 + 18 + 19) / 4, (14 + 15 + 20 + 21) / 4,
                     (16 + 17 + 22 + 23) / 4]])
    assert np.allclose(out, exp)
    # color: pure-R pixels weigh 0.299
    c = np.zeros((4, 6, 3), dtype=np.uint8)
    c[..., 0] = g
    assert np.allclose(box_mean_gray(c, 3, 2), exp * 0.299)


def test_dhash64_bit_order():
    from fuzzy_matcher_ray.functions.media import dhash64
    # 8 rows × 9 cols where ONLY the first comparison (row 0: cell0 >
    # cell1) is true → MSB-first bit 0 set → hash = 1 << 63
    px = np.zeros((8, 9), dtype=np.uint8)
    px[0, 0] = 255
    assert dhash64(px) == 1 << 63
    # strictly increasing rows → no left>right bit anywhere → 0
    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    assert dhash64(inc) == 0


def test_planted_variant_hashes(ray_session, tmp_path):
    """PNG and resized members hash identically to the base; the
    perturbed-JPEG member sits within Hamming 2; unrelated images are far."""
    from fuzzy_matcher_ray.functions.simhash import hamming64
    from fuzzy_matcher_ray.pipelines.multimodal import image_dhash
    sf = _docs_fixture(tmp_path, 64)
    out = image_dhash(sf).to_pandas()
    assert out.dhash.notna().all()
    h = out.dhash.to_numpy().astype(np.int64).view(np.uint64)
    for g in range(0, 16, 2):                 # planted clusters
        base = h[4 * g]
        assert h[4 * g + 1] == base            # PNG twin
        assert h[4 * g + 2] == base            # aligned resize twin
        d = int(hamming64(np.array([base]), np.array([h[4 * g + 3]]))[0])
        assert d <= 2                          # perturbed JPEG near-dup
    for g in range(1, 16, 2):                 # unrelated members
        hs = h[4 * g: 4 * g + 4]
        for i in range(4):
            for j in range(i + 1, 4):
                assert int(hamming64(np.array([hs[i]]),
                                     np.array([hs[j]]))[0]) > 3


def test_image_dup_pairs_planted_truth(ray_session, tmp_path):
    from fuzzy_matcher_ray.pipelines.multimodal import image_dup_pairs
    n = 80
    sf = _docs_fixture(tmp_path, n)
    got = {(r["a"], r["b"])
           for r in image_dup_pairs(sf, max_hamming=3).take_all()}
    expected = set()
    for g in range(0, n // 4, 2):
        ids = [4 * g + m for m in range(4)]
        expected |= {(a, b) for i, a in enumerate(ids)
                     for b in ids[i + 1:]}
    assert got == expected                    # recall 1.0, precision 1.0


def test_image_dup_clusters_contract(ray_session, tmp_path):
    """(doc_id, cluster_id): every doc once, planted groups collapse to
    min-id, odd-group members stay singletons."""
    from fuzzy_matcher_ray.pipelines.multimodal import image_dup_clusters
    n = 64
    sf = _docs_fixture(tmp_path, n)
    out = image_dup_clusters(sf).to_pandas()
    assert out.doc_id.tolist() == list(range(n))
    exp = [4 * (i // 4) if (i // 4) % 2 == 0 else i for i in range(n)]
    assert out.cluster_id.tolist() == exp


def test_image_hasher_dead_letters(ray_session):
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.multimodal import ImageHasher
    bad = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([b"", b"not an image",
                             b"P6 garbage header"], pa.binary())}))
    out = bad.map_batches(ImageHasher, batch_format="pyarrow",
                          concurrency=1).to_pandas()
    assert out.dhash.isna().all()


def test_image_dup_pairs_rejects_wide_hamming(ray_session, tmp_path):
    from fuzzy_matcher_ray.pipelines.multimodal import image_dup_pairs
    with pytest.raises(ValueError):
        image_dup_pairs(_docs_fixture(tmp_path, 4), max_hamming=5)
