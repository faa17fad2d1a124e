"""Baseline JPEG codec (functions/jpeg): layer-by-layer non-circular
oracles — the DCT pair is checked as an exact inverse on its own, Huffman
encode/decode as an exact inverse on coefficient streams, and the full
lossy round trip against the quantization-error bound — plus the
dead-letter contract (every malformed payload raises ValueError, never
any other exception type)."""

import numpy as np
import pytest

from fuzzy_matcher_ray.functions import jpeg


def test_dct_pair_exact_inverse():
    rng = np.random.default_rng(7)
    b = rng.uniform(-128, 127, (20, 8, 8))
    C = jpeg._DCT
    coef = np.einsum("ij,njk,lk->nil", C, b, C)
    back = np.einsum("ji,njk,kl->nil", C, coef, C)
    assert np.abs(back - b).max() < 1e-9
    # orthonormality straight from the definition
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)


def test_huffman_stream_exact_inverse():
    """encode_block_stream ∘ decode_block_stream is identity on arbitrary
    sparse coefficient blocks, across the 3-component interleave with
    per-component DC prediction chains."""
    rng = np.random.default_rng(9)
    zz = rng.integers(-900, 900, (60, 64)).astype(np.int32)
    zz[rng.random((60, 64)) < 0.8] = 0
    ids = np.tile(np.arange(3), 20)
    enc_dc = [jpeg._canonical_codes(*t) for t in
              (jpeg._DC_LUMA, jpeg._DC_CHROMA, jpeg._DC_CHROMA)]
    enc_ac = [jpeg._canonical_codes(*t) for t in
              (jpeg._AC_LUMA, jpeg._AC_CHROMA, jpeg._AC_CHROMA)]
    w = jpeg._BitWriter()
    jpeg.encode_block_stream(zz, ids, enc_dc, enc_ac, w)
    data = np.frombuffer(w.flush(), np.uint8)
    stuffed = np.nonzero((data[:-1] == 0xFF) & (data[1:] == 0x00))[0]
    if len(stuffed):
        data = np.delete(data, stuffed + 1)
    dec_dc = [jpeg._decode_table(*t) for t in
              (jpeg._DC_LUMA, jpeg._DC_CHROMA, jpeg._DC_CHROMA)]
    dec_ac = [jpeg._decode_table(*t) for t in
              (jpeg._AC_LUMA, jpeg._AC_CHROMA, jpeg._AC_CHROMA)]
    out = jpeg.decode_block_stream(jpeg._BitReader(data), 60, ids,
                                   dec_dc, dec_ac)
    assert np.array_equal(out, zz)


def test_magnitude_extend_inverse():
    for v in list(range(-300, 301)) + [-2047, 2047, 1023, -1024]:
        size, bits = jpeg._magnitude(v)
        assert jpeg._extend(bits, size) == v


@pytest.mark.parametrize("shape,quality", [
    ((33, 41), 90),        # grayscale, non-multiple-of-8 dims
    ((8, 8), 75),          # single block
    ((1, 1), 95),          # degenerate
    ((40, 56, 3), 95),     # color 4:4:4
    ((17, 9, 3), 85),      # color with edge padding both axes
])
def test_roundtrip_within_quant_bound(shape, quality):
    """Lossy round trip: the error of any DCT-quantization codec is
    bounded by half a quantization step per coefficient; empirically the
    Annex-K tables at q>=75 keep random noise within a loose mean bound
    and smooth gradients nearly exact."""
    rng = np.random.default_rng(sum(shape) + quality)
    px = rng.integers(0, 256, shape).astype(np.uint8)
    d = jpeg.parse_jpeg(jpeg.make_jpeg(px, quality=quality))
    assert d["width"] == shape[1] and d["height"] == shape[0]
    assert d["channels"] == (3 if len(shape) == 3 else 1)
    assert d["pixels"].shape == px.shape
    err = np.abs(d["pixels"].astype(int) - px.astype(int))
    assert err.mean() < 20          # random noise is the codec's worst case


def test_roundtrip_smooth_nearly_exact():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([yy * 2, xx * 2, yy + xx], axis=-1).astype(np.uint8)
    d = jpeg.parse_jpeg(jpeg.make_jpeg(img, quality=98))
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    assert err.max() <= 2 and err.mean() < 0.05


def test_deterministic_bytes():
    px = (np.arange(24 * 16 * 3, dtype=np.int64) % 251).astype(
        np.uint8).reshape(24, 16, 3)
    assert jpeg.make_jpeg(px, 85) == jpeg.make_jpeg(px, 85)


def test_malformed_only_value_error():
    """Dead-letter contract: any truncation or single-byte corruption of a
    valid payload raises ValueError — no IndexError/KeyError/OverflowError
    leaks that would crash the MediaDecoder stage."""
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256],
                   axis=-1).astype(np.uint8)
    buf = jpeg.make_jpeg(img, quality=90)
    for cut in range(2, len(buf), 23):
        with pytest.raises(ValueError):
            jpeg.parse_jpeg(buf[:cut])
    rng = np.random.default_rng(13)
    for _ in range(300):
        b = bytearray(buf)
        i = int(rng.integers(2, len(b)))
        b[i] = int(rng.integers(0, 256))
        try:
            jpeg.parse_jpeg(bytes(b))
        except ValueError:
            pass                    # dead-letter path, as specified
    with pytest.raises(ValueError):
        jpeg.parse_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg.parse_jpeg(b"\xff\xd8\xff\xd9")         # no SOF/SOS


def test_out_of_scope_rejected_loudly():
    """Progressive (SOF2) and subsampled payloads raise, not mis-decode."""
    buf = bytearray(jpeg.make_jpeg(np.zeros((8, 8), np.uint8)))
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xC2                                # SOF0 -> SOF2
    with pytest.raises(ValueError, match="baseline"):
        jpeg.parse_jpeg(bytes(buf))
    buf = bytearray(jpeg.make_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 4 + 7] = 0x22                            # Y sampling 2x2
    with pytest.raises(ValueError, match="subsampled"):
        jpeg.parse_jpeg(bytes(buf))
