"""Media decode: REAL WAV/PPM decoders (pure numpy/struct) — exact
round-trip oracles — plus the dead-letter path for malformed payloads."""

import numpy as np
import pyarrow as pa
import pytest

from fuzzy_matcher_ray.functions import media


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(4)
    samples = (rng.standard_normal(1234) * 9000).astype(np.int16)
    buf = media.make_wav(samples, 16000)
    w = media.parse_wav(buf)
    assert w["channels"] == 1 and w["sample_rate"] == 16000
    assert w["n_frames"] == 1234
    assert w["duration_ms"] == round(1234 * 1000 / 16000)
    assert np.array_equal(w["samples"], samples)
    assert 0.0 < media.wav_rms(w["samples"]) < 1.0


def test_ppm_roundtrip_exact():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    buf = media.make_ppm(px)
    p = media.parse_ppm(buf)
    assert (p["width"], p["height"]) == (31, 24)
    assert np.array_equal(p["pixels"], px)
    # luma of a solid-gray image is that gray level
    gray = np.full((4, 4, 3), 128, np.uint8)
    assert abs(media.ppm_mean_luma(gray) - 128.0) < 1e-9


def test_malformed_payloads_raise():
    with pytest.raises(ValueError):
        media.parse_wav(b"RIFFxxxxWAVE")          # truncated
    with pytest.raises(ValueError):
        media.parse_wav(b"\x89PNG\r\n")           # wrong container
    with pytest.raises(ValueError):
        media.parse_ppm(b"P6\n10 10\n255\nxx")    # truncated pixels


def test_media_decode_pipeline(ray_session):
    """Pipeline e2e: synthesized payloads decode to EXACTLY the parameters
    they were synthesized with (the brute-force oracle re-synthesizes)."""
    from fuzzy_matcher_ray.pipelines.multimodal import (
        decode_media_docs, synth_media_payload)
    df = decode_media_docs("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.kind) == {"wav", "ppm"}
    for _, row in df.head(60).iterrows():
        buf = synth_media_payload(int(row.doc_id))
        assert row.n_bytes == len(buf)
        if row.kind == "wav":
            w = media.parse_wav(buf)
            assert row.sample_rate == w["sample_rate"]
            assert row.duration_ms == w["duration_ms"]
            assert abs(row.feature - media.wav_rms(w["samples"])) < 1e-12
        else:
            p = media.parse_ppm(buf)
            assert (row.width, row.height) == (p["width"], p["height"])
            assert abs(row.feature - media.ppm_mean_luma(p["pixels"])) < 1e-12


def test_media_decoder_dead_letters(ray_session):
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.multimodal import MediaDecoder
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([b"RIFF\x00\x00", b"\xff\xd8\xff\xe0jpeg!", None],
                            pa.binary())})
    out = rd.from_arrow(t).map_batches(MediaDecoder, batch_format="pyarrow",
                                       batch_size=8, concurrency=1).to_pandas()
    kinds = dict(zip(out.doc_id, out.kind))
    assert kinds[1] == "error"        # malformed RIFF dead-lettered
    assert kinds[2] == "unknown"      # codec format honestly not decoded
    assert kinds[3] in ("error", "unknown")
