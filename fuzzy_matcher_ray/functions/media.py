"""Pure-numpy media encode/decode without codec libraries.

WAV (RIFF/PCM) and PPM (netpbm P6) are container-less — headers are plain
structs, payloads raw samples/pixels. PNG (8-bit RGB, non-interlaced) is a
REAL codec format decoded here with stdlib zlib + a numpy unfilter pass
(all five scanline filters). Baseline JPEG — a true entropy/transform
codec — lives in functions/jpeg (canonical Huffman + vectorized IDCT);
only MP3/H.264 stay honestly stubbed in the multimodal stage.

Encoders exist to synthesize deterministic test payloads; decoders are the
product surface. Round-trip exactness is asserted in tests/test_multimodal.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

WAV_MAGIC = b"RIFF"
PPM_MAGIC = b"P6"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def make_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono 16-bit PCM WAV from an int16 sample array."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def parse_wav(buf: bytes) -> dict:
    """Header + samples of a mono/stereo PCM WAV. Raises ValueError on a
    malformed payload (dead-lettered by the decode stage, never crashes
    the pipeline)."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8: pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding fmt={audio_fmt} bits={bits}")
    if rate <= 0 or n_ch <= 0:
        # must be ValueError: the decode stages' dead-letter catch promises
        # malformed payloads never crash the pipeline
        raise ValueError(f"invalid WAV fmt rate={rate} channels={n_ch}")
    samples = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        samples = samples[: (len(samples) // n_ch) * n_ch].reshape(-1, n_ch)
    n_frames = len(samples) if samples.ndim == 1 else samples.shape[0]
    return {"channels": int(n_ch), "sample_rate": int(rate),
            "n_frames": int(n_frames),
            "duration_ms": int(round(n_frames * 1000 / rate)),
            "samples": samples}


def wav_rms(samples: np.ndarray) -> float:
    """RMS amplitude of int16 samples, normalized to [0, 1]."""
    if samples.size == 0:
        return 0.0
    x = samples.astype(np.float64) / 32768.0
    return float(np.sqrt(np.mean(x * x)))


def make_ppm(pixels: np.ndarray) -> bytes:
    """P6 binary PPM from a (h, w, 3) uint8 array."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + \
        np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def parse_ppm(buf: bytes) -> dict:
    """Header + pixels of a binary P6 PPM. Raises ValueError when malformed."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(buf):
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1                                    # single whitespace after maxval
    if len(fields) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raw = buf[pos: pos + need]
    if len(raw) < need:
        raise ValueError("truncated PPM pixel data")
    return {"width": int(w), "height": int(h),
            "pixels": np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG filter 4), vectorized over a scanline."""
    a = left.astype(np.int32)
    b = up.astype(np.int32)
    c = upleft.astype(np.int32)
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def make_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """8-bit RGB non-interlaced PNG from a (h, w, 3) uint8 array.

    ``filters`` picks the per-row scanline filter (default cycles 0..4 so
    round-trip tests exercise every decoder filter branch). Encoding is
    fully vectorized: every predictor reads ORIGINAL neighbor bytes.
    """
    h, w, _ = pixels.shape
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    raw = px.reshape(h, w * 3)
    left = np.zeros_like(raw)
    left[:, 3:] = raw[:, :-3]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, 3:] = raw[:-1, :-3]
    lines = bytearray()
    for r in range(h):
        f = (filters[r % len(filters)] if filters else r % 5)
        if f == 0:
            enc = raw[r]
        elif f == 1:
            enc = raw[r] - left[r]
        elif f == 2:
            enc = raw[r] - up[r]
        elif f == 3:
            enc = raw[r] - ((left[r].astype(np.uint16)
                             + up[r].astype(np.uint16)) // 2).astype(np.uint8)
        else:
            enc = raw[r] - _paeth(left[r], up[r], upleft[r])
        lines.append(f)
        lines.extend(enc.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b""))


def parse_png(buf: bytes) -> dict:
    """Header + pixels of an 8-bit RGB non-interlaced PNG — REAL decode:
    stdlib zlib inflate + numpy unfilter (all five scanline filters).
    Raises ValueError on malformed/unsupported payloads (dead-letter
    contract: never crashes the decode stage).

    Filters 0/2 unfilter as whole-row numpy ops and filter 1 as a per-
    channel modular cumsum; 3 (average) and 4 (Paeth) need the
    reconstructed left neighbor, so they walk pixels within the row
    (bounded by width; rows stay numpy slices).
    """
    if not buf.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (clen,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4: pos + 8]
        data = buf[pos + 8: pos + 8 + clen]
        if len(data) < clen:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen                       # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG depth={depth} color={color} interlace={interlace}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG IDAT stream: {e}") from e
    stride = w * 3
    if len(raw) < h * (1 + stride):
        raise ValueError("truncated PNG pixel data")
    rows = np.frombuffer(raw[: h * (1 + stride)], dtype=np.uint8) \
        .reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    cur = rows[:, 1:]
    recon = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = int(ftypes[r])
        c = cur[r]
        if f == 0:
            recon[r] = c
        elif f == 1:
            # Sub: recon[x] = c[x] + recon[x-3] — a modular cumsum per channel
            for ch in range(3):
                recon[r, ch::3] = np.cumsum(
                    c[ch::3].astype(np.uint64)).astype(np.uint8)
        elif f == 2:
            recon[r] = c + prev
        elif f in (3, 4):
            row = recon[r]
            for x in range(0, stride, 3):
                lft = row[x - 3: x] if x else np.zeros(3, np.uint8)
                u = prev[x: x + 3]
                if f == 3:
                    pred = ((lft.astype(np.uint16) + u.astype(np.uint16))
                            // 2).astype(np.uint8)
                else:
                    ul = (prev[x - 3: x] if x else np.zeros(3, np.uint8))
                    pred = _paeth(lft, u, ul)
                row[x: x + 3] = c[x: x + 3] + pred
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        prev = recon[r]
    return {"width": int(w), "height": int(h),
            "pixels": recon.reshape(h, w, 3)}


def ppm_mean_luma(pixels: np.ndarray) -> float:
    """Mean Rec.601 luma of (h, w, 3) uint8 pixels, in [0, 255]."""
    if pixels.size == 0:
        return 0.0
    p = pixels.astype(np.float64)
    return float(np.mean(0.299 * p[..., 0] + 0.587 * p[..., 1]
                         + 0.114 * p[..., 2]))


def box_mean_gray(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(h, w[, 3]) uint8 pixels → (out_h, out_w) float64 cell means of the
    Rec.601 luma, cells = the standard box partition (bounds ⌊i·dim/out⌋).

    Area averaging (not nearest-sampling) is what makes the perceptual
    hash stable under resizes and codec noise: every source pixel
    contributes to exactly one cell, so a resampled image produces nearly
    the same cell means. Exact float64 sums over integer luma inputs —
    deterministic across batch layouts.
    """
    if pixels.ndim == 3:
        p = pixels.astype(np.float64)
        g = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    else:
        g = pixels.astype(np.float64)
    h, w = g.shape
    yb = (np.arange(out_h + 1) * h) // out_h
    xb = (np.arange(out_w + 1) * w) // out_w
    # integral image: box sums in O(1) per cell, exact float64 over ≤255
    # inputs (far inside the 2^53 mantissa)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(g, axis=0), axis=1, out=ii[1:, 1:])
    sums = (ii[yb[1:, None], xb[None, 1:]] - ii[yb[:-1, None], xb[None, 1:]]
            - ii[yb[1:, None], xb[None, :-1]]
            + ii[yb[:-1, None], xb[None, :-1]])
    areas = ((yb[1:] - yb[:-1])[:, None] * (xb[1:] - xb[:-1])[None, :])
    return sums / np.maximum(areas, 1)


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash (dHash): 9×8 luma box means, bit = left cell
    brighter than its right neighbor, row-major bit order. The standard
    public perceptual-hash construction (gradient hash)."""
    g = box_mean_gray(pixels, 9, 8)
    bits = (g[:, :-1] > g[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def envelope_hash64(samples: np.ndarray, n_seg: int = 65) -> int:
    """64-bit audio fingerprint: RMS energy over 65 equal time segments
    (box partition ⌊i·n/65⌋), bit = segment louder than its successor.

    The energy-envelope difference hash — the audio analogue of the image
    dHash (adjacent-sign coding of a coarse perceptual profile, the same
    public construction family as Chromaprint's band-energy differences).
    Invariant by construction to positive amplitude scaling (signs of
    differences survive any monotone gain) and stable under resampling
    (per-segment RMS is a time-normalized quantity). Exact float64 sums
    of int32 squares — deterministic."""
    x = samples.astype(np.float64)
    n = len(x)
    if n < n_seg:
        x = np.pad(x, (0, n_seg - n))
        n = n_seg
    bounds = (np.arange(n_seg + 1) * n) // n_seg
    csq = np.zeros(n + 1, dtype=np.float64)
    np.cumsum(x * x, out=csq[1:])
    energy = csq[bounds[1:]] - csq[bounds[:-1]]
    ms = energy / np.maximum(bounds[1:] - bounds[:-1], 1)
    bits = ms[:-1] > ms[1:]
    return int(np.packbits(bits).view(">u8")[0])


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, 3) uint8 pixels to (out_h, out_w, 3).

    Pure numpy (integer center-sample index map — the standard
    nearest-neighbor rule: src = floor((dst + 0.5) * scale)), deterministic,
    no codec library. The real-deployment analogue swaps this for
    PIL/libvips inside the same actor stage.
    """
    h, w, _ = pixels.shape
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64),
                    h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64),
                    w - 1)
    return pixels[ys[:, None], xs[None, :]]


def fit_within(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving (out_w, out_h) with max(out) == max_dim (no
    upscaling: inputs already within the box are returned unchanged)."""
    if max(w, h) <= max_dim:
        return w, h
    if w >= h:
        return max_dim, max(1, round(h * max_dim / w))
    return max(1, round(w * max_dim / h)), max_dim


def frame_windows(samples: np.ndarray, rate: int, win_ms: int = 25,
                  hop_ms: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Frame-sample mono int16 audio: windows of ``win_ms`` every ``hop_ms``.

    Returns (t_ms, rms): per-frame start times and normalized RMS, both
    float64. Vectorized — one strided gather, no Python loop over frames.
    """
    if samples.ndim > 1:                       # stereo → mean to mono
        samples = samples.mean(axis=1)
    win = max(1, int(rate * win_ms / 1000))
    hop = max(1, int(rate * hop_ms / 1000))
    n = samples.size
    if n < win:
        return np.empty(0), np.empty(0)
    n_frames = 1 + (n - win) // hop
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    x = samples.astype(np.float64)[idx] / 32768.0
    rms = np.sqrt(np.mean(x * x, axis=1))
    t_ms = hop * np.arange(n_frames, dtype=np.float64) * 1000.0 / rate
    return t_ms, rms
