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
    from fuzzy_matcher_ray.functions import jpeg
    df = decode_media_docs("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.kind) == {"wav", "ppm", "png", "jpeg"}
    for _, row in df.head(60).iterrows():
        buf = synth_media_payload(int(row.doc_id))
        assert row.n_bytes == len(buf)
        if row.kind == "wav":
            w = media.parse_wav(buf)
            assert row.sample_rate == w["sample_rate"]
            assert row.duration_ms == w["duration_ms"]
            assert abs(row.feature - media.wav_rms(w["samples"])) < 1e-12
        elif row.kind == "jpeg":
            p = jpeg.parse_jpeg(buf)
            assert (row.width, row.height) == (p["width"], p["height"])
            assert row.channels == p["channels"]
            px = p["pixels"]
            exp = (px.mean() if px.ndim == 2
                   else media.ppm_mean_luma(px))
            assert abs(row.feature - exp) < 1e-12
        else:
            parse = media.parse_ppm if row.kind == "ppm" else media.parse_png
            p = parse(buf)
            assert (row.width, row.height) == (p["width"], p["height"])
            assert abs(row.feature - media.ppm_mean_luma(p["pixels"])) < 1e-12


def test_media_decoder_dead_letters(ray_session):
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.multimodal import MediaDecoder
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array([b"RIFF\x00\x00", b"\xff\xd8\xff\xe0jpeg!",
                             None, b"ID3\x03\x00mp3-frames"],
                            pa.binary())})
    out = rd.from_arrow(t).map_batches(MediaDecoder, batch_format="pyarrow",
                                       batch_size=8, concurrency=1).to_pandas()
    kinds = dict(zip(out.doc_id, out.kind))
    assert kinds[1] == "error"        # malformed RIFF dead-lettered
    assert kinds[2] == "error"        # truncated JPEG dead-lettered
    assert kinds[3] in ("error", "unknown")
    assert kinds[4] == "unknown"      # MP3: honestly not decoded


def test_resize_kernel_exact():
    """Nearest-neighbor resize: exact index-map semantics, aspect fit."""
    from fuzzy_matcher_ray.functions.media import fit_within, resize_nearest
    px = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(8, 4, 3)
    r = resize_nearest(px, 2, 4)
    assert r.shape == (4, 2, 3)
    # center-sample rule: src_row = floor((dst+0.5)*8/4), src_col analog
    ys = np.minimum(((np.arange(4) + 0.5) * 8 / 4).astype(int), 7)
    xs = np.minimum(((np.arange(2) + 0.5) * 4 / 2).astype(int), 3)
    assert (r == px[ys[:, None], xs[None, :]]).all()
    assert fit_within(1920, 1080, 32) == (32, 18)
    assert fit_within(10, 20, 32) == (10, 20)     # no upscale
    with pytest.raises(ValueError):
        resize_nearest(px, 0, 4)


def test_frame_windows_exact():
    """Frame sampling: exact frame count, times and RMS values."""
    from fuzzy_matcher_ray.functions.media import frame_windows
    rate = 8000
    x = (np.sin(np.arange(4000) / 8) * 10000).astype(np.int16)
    t_ms, rms = frame_windows(x, rate, win_ms=25, hop_ms=100)
    win, hop = 200, 800
    n_frames = 1 + (4000 - win) // hop
    assert len(t_ms) == n_frames
    assert t_ms[1] - t_ms[0] == pytest.approx(100.0)
    xf = x[hop: hop + win].astype(np.float64) / 32768.0
    assert rms[1] == pytest.approx(np.sqrt(np.mean(xf * xf)), abs=1e-12)
    # shorter than one window -> no frames
    t2, r2 = frame_windows(x[:100], rate, 25, 100)
    assert len(t2) == 0 and len(r2) == 0


def test_resize_pipeline(ray_session):
    """ImageResizer actor stage over mixed WAV/PPM payloads: PPM rows get
    real resized payloads (round-trip verified), WAV rows dead-letter as
    kind=skip."""
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.multimodal import (
        ImageResizer, synth_media_payload)
    from fuzzy_matcher_ray.functions import jpeg
    ids = list(range(16))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_media_payload(i) for i in ids],
                            pa.binary())})
    out = rd.from_arrow(t).map_batches(
        ImageResizer, fn_constructor_args=(16,), batch_format="pyarrow",
        batch_size=8, concurrency=1).to_pandas().set_index("doc_id")
    for i in ids:
        row = out.loc[i]
        if i % 4 == 0:                               # WAV
            assert row.kind == "skip"
            continue
        kind = {1: "ppm", 2: "png", 3: "jpeg"}[i % 4]
        parse = {"ppm": media.parse_ppm, "png": media.parse_png,
                 "jpeg": jpeg.parse_jpeg}[kind]
        assert row.kind == kind
        p = parse(synth_media_payload(i))
        ow, oh = media.fit_within(p["width"], p["height"], 16)
        assert (row.out_width, row.out_height) == (ow, oh)
        rp = parse(row.payload_out)                  # re-encoded same format
        assert (rp["width"], rp["height"]) == (ow, oh)
        src = p["pixels"]
        if src.ndim == 2:                            # grayscale JPEG
            exp = media.resize_nearest(
                np.repeat(src[..., None], 3, axis=-1), ow, oh)[..., 0]
        else:
            exp = media.resize_nearest(src, ow, oh)
        if kind == "jpeg":                           # lossy re-encode bound
            assert np.abs(rp["pixels"].astype(int)
                          - exp.astype(int)).mean() < 16
        else:
            assert (rp["pixels"] == exp).all()


def test_frame_pipeline(ray_session):
    """AudioFramer fan-out: WAV docs produce exact per-frame rows, PPM
    docs none; frame RMS matches the kernel on the decoded samples."""
    import ray.data as rd

    from fuzzy_matcher_ray.pipelines.multimodal import (
        AudioFramer, synth_media_payload)
    ids = list(range(8))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_media_payload(i) for i in ids],
                            pa.binary())})
    out = rd.from_arrow(t).map_batches(
        AudioFramer, batch_format="pyarrow", batch_size=8,
        concurrency=1).to_pandas()
    assert set(out.doc_id) == {i for i in ids if i % 4 == 0 and len(
        media.frame_windows(media.parse_wav(synth_media_payload(i))["samples"],
                            media.parse_wav(synth_media_payload(i))["sample_rate"],
                            25, 100)[0]) > 0}
    for i in sorted(set(out.doc_id)):
        w = media.parse_wav(synth_media_payload(i))
        t_exp, rms_exp = media.frame_windows(w["samples"], w["sample_rate"],
                                             25, 100)
        g = out[out.doc_id == i].sort_values("frame_idx")
        assert len(g) == len(t_exp)
        assert np.allclose(g.t_ms.values, t_exp)
        assert np.allclose(g.rms.values, rms_exp, atol=1e-12)


def test_parse_wav_zero_rate_is_value_error():
    """A fmt chunk declaring sample_rate=0 must raise ValueError (the
    dead-letter contract), not ZeroDivisionError."""
    import struct

    import pytest

    from fuzzy_matcher_ray.functions.media import parse_wav
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    data = struct.pack("<4sI", b"data", 4) + b"\x00\x00\x00\x00"
    body = struct.pack("<4sI", b"fmt ", len(fmt)) + fmt + data
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    with pytest.raises(ValueError):
        parse_wav(wav)


def test_png_roundtrip_exact_all_filters():
    """make_png/parse_png round-trip every scanline filter type exactly."""
    rng = np.random.default_rng(6)
    for (h, w) in ((1, 1), (5, 7), (24, 31), (17, 3)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for filters in (None, [0], [1], [2], [3], [4], [4, 3, 2, 1, 0]):
            p = media.parse_png(media.make_png(px, filters))
            assert (p["width"], p["height"]) == (w, h)
            assert np.array_equal(p["pixels"], px)


def test_png_decoder_vs_spec_reference():
    """parse_png against an INDEPENDENT per-pixel reference encoder written
    straight from the PNG spec (no shared code with make_png): hand-filter
    each row with its predictor over original bytes, deflate, chunk."""
    import struct
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc_:
            return a
        return b if pb <= pc_ else c

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    h, w = px.shape[:2]
    raw = px.reshape(h, w * 3).astype(int)
    lines = bytearray()
    for r in range(h):
        f = r % 5
        lines.append(f)
        for x in range(w * 3):
            left = raw[r][x - 3] if x >= 3 else 0
            up = raw[r - 1][x] if r else 0
            upleft = raw[r - 1][x - 3] if (r and x >= 3) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                pred = paeth(left, up, upleft)
            lines.append((raw[r][x] - pred) % 256)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    buf = (media.PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(lines)))
           + chunk(b"IEND", b""))
    p = media.parse_png(buf)
    assert np.array_equal(p["pixels"], px)


def test_png_malformed_raises():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = media.make_png(px)
    for bad in (b"\x89PNG\r\n\x1a\nxxxxxx", good[:40],
                good.replace(b"IDAT", b"XDAT")):
        with pytest.raises(ValueError):
            media.parse_png(bad)
    # unsupported shape: RGBA color type
    import struct, zlib
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    rgba = (media.PNG_MAGIC
            + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pytest.raises(ValueError):
        media.parse_png(rgba + struct.pack(">I", 0) + b"IDAT"
                        + struct.pack(">I", zlib.crc32(b"IDAT")))
