"""Audio fingerprint dedup: envelope-hash kernel invariances, planted
clusters over the real WAV decoder, and the shared cluster contract."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _docs_fixture(tmp_path, n_docs):
    tbl = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                    "text": pa.array(["x"] * n_docs, pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_envelope_hash_invariances():
    from fuzzy_matcher_ray.functions.media import envelope_hash64
    rng = np.random.default_rng(3)
    amps = rng.integers(1, 10, size=65).astype(np.float64) * 700 + 500
    t = np.arange(65 * 64, dtype=np.float64)
    s = (np.repeat(amps, 64) * np.sin(2 * np.pi * t / 16.0)).astype(np.int16)
    h = envelope_hash64(s)
    # exact gain invariance (integer halving keeps energy ordering here:
    # adjacent RMS gaps are hundreds of units)
    assert envelope_hash64((s * 0.5).astype(np.int16)) == h
    # hand-checkable bit order: loud→quiet single step sets only bit 0
    two = np.concatenate([np.full(64, 1000, np.int16),
                          np.zeros(64 * 64, np.int16)])
    assert envelope_hash64(two) == 1 << 63
    # silence → all-equal energies → hash 0; short payloads pad
    assert envelope_hash64(np.zeros(10, np.int16)) == 0


def test_planted_audio_variants(ray_session, tmp_path):
    from fuzzy_matcher_ray.functions.simhash import hamming64
    from fuzzy_matcher_ray.pipelines.multimodal import audio_fingerprint
    sf = _docs_fixture(tmp_path, 64)
    out = audio_fingerprint(sf).to_pandas()
    assert out.ahash.notna().all()
    h = out.ahash.to_numpy().astype(np.int64).view(np.uint64)
    for g in range(0, 16, 2):
        base = h[4 * g]
        assert h[4 * g + 1] == base            # gain ×0.5 twin
        assert h[4 * g + 2] == base            # 2× resample twin
        d = int(hamming64(np.array([base]), np.array([h[4 * g + 3]]))[0])
        assert d <= 2                          # one-segment edit
    for g in range(1, 16, 2):
        hs = h[4 * g: 4 * g + 4]
        for i in range(4):
            for j in range(i + 1, 4):
                assert int(hamming64(np.array([hs[i]]),
                                     np.array([hs[j]]))[0]) > 3


def test_audio_dup_clusters_contract(ray_session, tmp_path):
    from fuzzy_matcher_ray.pipelines.multimodal import audio_dup_clusters
    n = 64
    sf = _docs_fixture(tmp_path, n)
    out = audio_dup_clusters(sf).to_pandas()
    assert out.doc_id.tolist() == list(range(n))
    exp = [4 * (i // 4) if (i // 4) % 2 == 0 else i for i in range(n)]
    assert out.cluster_id.tolist() == exp


def test_audio_hasher_dead_letters(ray_session):
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.multimodal import AudioHasher
    bad = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([b"", b"RIFFxxxxWAVEtrunc"], pa.binary())}))
    out = bad.map_batches(AudioHasher, batch_format="pyarrow",
                          concurrency=1).to_pandas()
    assert out.ahash.isna().all()
