"""Pure-numpy/stdlib baseline JPEG (ITU-T T.81 sequential DCT, SOF0).

Retires the last codec stub (multimodal previously raised NotImplemented
for JPEG): a REAL entropy decoder — marker parse, canonical Huffman over
the byte-stuffed scan, dequantize, vectorized 8x8 IDCT, YCbCr→RGB — plus
an encoder that synthesizes deterministic test payloads with the spec's
Annex-K quantization/Huffman tables.

Scope (documented, enforced with ValueError so the decode stage's
dead-letter contract holds): baseline sequential only (SOF0), 8-bit,
grayscale or 4:4:4 color (all sampling factors 1x1 — what the encoder
emits; progressive/subsampled payloads are rejected loudly, not wrongly).
Restart markers (DRI/RSTn) are supported.

Correctness is NOT circular encoder↔decoder trust: tests assert the
DCT/IDCT pair is an exact inverse on its own, Huffman encode/decode is an
exact inverse on coefficient streams, and the lossy round trip stays
within the quantization-error bound (tests/test_multimodal.py).

Parity note: the reference repo has no media path at all — this module
exists for the 100TB-training-pipeline surface (multimodal columns), per
SURVEY.md §2's "beyond the reference" scope.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# ITU-T T.81 Annex K.1/K.2 — example quantization tables (quality 50 base)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag scan order: _ZIGZAG[i] = raster index of the i-th zigzag element
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 — typical Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: coeffs = C @ block @ C.T."""
    k = np.arange(8, dtype=np.float64)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    c[0, :] = 1.0 / np.sqrt(8.0)
    return c


_DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (50 = base)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for a canonical JPEG Huffman table."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, the inverse mapping for decoding."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, values).items()}


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range conversion, float64 (h, w, 3)."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) → (n_blocks, 8, 8) in raster block order, edge-padded."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hb, wb = plane.shape[0] // 8, plane.shape[1] // 8
    return (plane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3)
            .reshape(hb * wb, 8, 8)), hb, wb


def _from_blocks(blocks: np.ndarray, hb: int, wb: int,
                 h: int, w: int) -> np.ndarray:
    """(n_blocks, 8, 8) raster block order → (h, w), padding cropped."""
    full = (blocks.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3)
            .reshape(hb * 8, wb * 8))
    return full[:h, :w]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:                        # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)         # pad with 1-bits
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG (size, amplitude-bits) coding of a signed coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude: amplitude bits → signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def encode_block_stream(zz: np.ndarray, comp_ids: np.ndarray,
                        dc_tables, ac_tables, writer: _BitWriter) -> None:
    """Entropy-code a sequence of zigzagged quantized blocks.

    ``zz``: (n, 64) int32 in MCU-interleaved scan order; ``comp_ids``: (n,)
    COMPONENT index — selects both the Huffman tables (``dc_tables[c]`` /
    ``ac_tables[c]``, so Cb and Cr pass the same chroma table twice) and
    the DC prediction chain, which the spec keeps PER COMPONENT (T.81
    F.1.1.5.1 — a shared Cb/Cr chain would desync any conforming decoder).
    Split out of make_jpeg so tests can assert Huffman encode↔decode is an
    exact inverse without a full image in the loop.
    """
    pred = {}
    for i in range(zz.shape[0]):
        c = int(comp_ids[i])
        dc_codes, ac_codes = dc_tables[c], ac_tables[c]
        row = zz[i]
        diff = int(row[0]) - pred.get(c, 0)
        pred[c] = int(row[0])
        size, bits = _magnitude(diff)
        code, ln = dc_codes[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for j in range(1, last + 1):
            v = int(row[j])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]           # ZRL: 16 zeros
                writer.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_codes[(run << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]               # EOB
            writer.write(code, ln)


def make_jpeg(pixels: np.ndarray, quality: int = 85) -> bytes:
    """Baseline JFIF JPEG from (h, w, 3) RGB or (h, w) grayscale uint8.

    4:4:4 (no chroma subsampling), Annex-K Huffman tables, deterministic
    byte-for-byte for a given (pixels, quality)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l, qt_c = _quality_tables(quality)
    planes = ([pixels.astype(np.float64)] if gray
              else list(np.moveaxis(_rgb_to_ycbcr(pixels), -1, 0)))
    qts = [qt_l] + ([qt_c, qt_c] if not gray else [])

    all_zz, comp_ids = [], []
    n_blocks = None
    for ci, (plane, qt) in enumerate(zip(planes, qts)):
        blocks, hb, wb = _to_blocks(plane)
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks - 128.0, _DCT)
        q = np.round(coef / qt.reshape(8, 8).astype(np.float64))
        zz = q.reshape(-1, 64)[:, _ZIGZAG].astype(np.int32)
        all_zz.append(zz)
        comp_ids.append(np.full(zz.shape[0], ci, np.int8))
        n_blocks = zz.shape[0]
    # interleave per MCU: with 1x1 sampling, MCU i = (Y_i, Cb_i, Cr_i)
    zz_i = np.stack(all_zz, axis=1).reshape(-1, 64)
    ids_i = np.stack(comp_ids, axis=1).reshape(-1)

    dc_l, dc_c = _canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)
    ac_l, ac_c = _canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)
    dc_tables = [dc_l, dc_c, dc_c]                  # indexed by component
    ac_tables = [ac_l, ac_c, ac_c]
    wtr = _BitWriter()
    encode_block_stream(zz_i, ids_i, dc_tables, ac_tables, wtr)
    scan = wtr.flush()

    out = bytearray(b"\xff\xd8")                    # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"    # APP0
    for tq, qt in enumerate([qt_l] + ([] if gray else [qt_c])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in qt[_ZIGZAG])    # DQT (zigzag order)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):                         # SOF0 components
        out += bytes([ci + 1, 0x11, min(ci, 1)])    # id, 1x1 sampling, Tq
    hts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        hts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, values) in hts:               # DHT
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([tc_th]) + bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):                         # SOS
        t = min(ci, 1)
        out += bytes([ci + 1, (t << 4) | t])
    out += b"\x00\x3f\x00"                          # Ss, Se, Ah/Al
    out += scan
    out += b"\xff\xd9"                              # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over a de-stuffed scan byte array."""

    def __init__(self, data: np.ndarray):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            self.acc = (self.acc << 8) | int(self.data[self.pos])
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def byte_align(self) -> None:
        self.acc = 0
        self.nbits = 0


def decode_block_stream(reader: _BitReader, n_blocks: int,
                        comp_ids: np.ndarray, dc_tables,
                        ac_tables) -> np.ndarray:
    """Inverse of encode_block_stream: → (n_blocks, 64) int32 zigzag."""
    out = np.zeros((n_blocks, 64), np.int32)
    pred: dict[int, int] = {}
    for i in range(n_blocks):
        c = int(comp_ids[i])
        t = reader.read_symbol(dc_tables[c])
        if t > 11:                                  # 8-bit baseline bound
            raise ValueError("JPEG DC magnitude category out of range")
        diff = _extend(reader.read(t), t) if t else 0
        dc = pred.get(c, 0) + diff
        if not -(1 << 20) < dc < (1 << 20):         # corrupt-stream runaway
            raise ValueError("JPEG DC prediction out of range")
        pred[c] = dc
        out[i, 0] = dc
        j = 1
        while j < 64:
            rs = reader.read_symbol(ac_tables[c])
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run == 15:                       # ZRL
                    j += 16
                    continue
                break                               # EOB
            j += run
            if j > 63:
                raise ValueError("JPEG AC run overflows block")
            out[i, j] = _extend(reader.read(size), size)
            j += 1
    return out


def parse_jpeg(buf: bytes) -> dict:
    """Decode a baseline JPEG → width/height/channels/pixels (uint8 RGB or
    (h, w) grayscale). ValueError on malformed or out-of-scope payloads
    (progressive, subsampled) — dead-lettered by the decode stage."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    scan_start = None
    comps_sos: list[tuple[int, int, int]] = []
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = buf[pos + 1]
        if marker == 0xD9:                          # EOI before SOS
            break
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        body = buf[pos + 4: pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + seglen
        if marker == 0xDB:                          # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                if b + 65 > len(body):
                    raise ValueError("truncated JPEG DQT")
                t = np.frombuffer(body[b + 1: b + 65], np.uint8)
                qtables[tq] = t.astype(np.int32)[_UNZIGZAG]
                b += 65
        elif marker == 0xC4:                        # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1: b + 17])
                nval = sum(bits)
                values = list(body[b + 17: b + 17 + nval])
                if len(bits) != 16 or len(values) != nval:
                    raise ValueError("truncated JPEG DHT")
                (ac_dec if tc else dc_dec)[th] = _decode_table(bits, values)
                b += 17 + nval
        elif marker == 0xC0:                        # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF0")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF0")
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci: 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "chroma-subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:                        # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                        # SOS
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("truncated JPEG SOS")
            ns = body[0]
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                tsel = body[2 + 2 * ci]
                comps_sos.append((cid, tsel >> 4, tsel & 0x0F))
            scan_start = pos
            break
        # APPn/COM/others: skipped via seglen
    if sof is None or scan_start is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise ValueError("zero-dimension JPEG")

    # extract the entropy scan: de-stuff 0xFF00, stop at EOI, strip RSTn
    raw = np.frombuffer(buf, np.uint8)[scan_start:]
    ff = np.nonzero(raw == 0xFF)[0]
    end = len(raw)
    segments = []
    prev = 0
    restarts = []
    for i in ff:
        if i + 1 >= len(raw):
            break
        nxt = raw[i + 1]
        if nxt == 0x00:
            continue
        if 0xD0 <= nxt <= 0xD7:                     # RSTn: segment boundary
            segments.append(raw[prev:i])
            restarts.append(True)
            prev = i + 2
            continue
        end = i                                     # EOI or next marker
        break
    segments.append(raw[prev:end])

    def _destuff(seg: np.ndarray) -> np.ndarray:
        if len(seg) == 0:
            return seg
        stuffed = np.nonzero((seg[:-1] == 0xFF) & (seg[1:] == 0x00))[0]
        if len(stuffed) == 0:
            return seg
        return np.delete(seg, stuffed + 1)

    segments = [_destuff(s) for s in segments]

    ncomp = len(comps)
    hb, wb = (h + 7) // 8, (w + 7) // 8
    n_mcu = hb * wb
    comp_pattern = np.arange(ncomp, dtype=np.int64)
    mcu_per_seg = (restart_interval if restart_interval else n_mcu)

    zz_parts = []
    mcu_done = 0
    for seg in segments:
        todo = min(mcu_per_seg, n_mcu - mcu_done)
        if todo <= 0:
            break
        rdr = _BitReader(seg)
        ids = np.tile(comp_pattern, todo)
        try:
            dct = {i: dc_dec[comps_sos[i][1]] if comps_sos else dc_dec[0]
                   for i in range(ncomp)}
            act = {i: ac_dec[comps_sos[i][2]] if comps_sos else ac_dec[0]
                   for i in range(ncomp)}
        except (KeyError, IndexError):
            raise ValueError("JPEG scan references a missing Huffman table")
        zz_parts.append(decode_block_stream(
            rdr, todo * ncomp, ids,
            [dct[i] for i in range(ncomp)], [act[i] for i in range(ncomp)]))
        mcu_done += todo
    if mcu_done < n_mcu:
        raise ValueError("truncated JPEG scan (missing MCUs)")
    zz = np.concatenate(zz_parts, axis=0)

    # de-interleave, dequantize, IDCT — fully vectorized per component
    planes = []
    for ci, (cid, tq) in enumerate(comps):
        czz = zz[ci::ncomp].astype(np.float64)
        if tq not in qtables:
            raise ValueError(f"missing quant table {tq}")
        coef = (czz * qtables[tq][_ZIGZAG])[:, _UNZIGZAG].reshape(-1, 8, 8)
        blocks = np.einsum("ji,njk,kl->nil", _DCT, coef, _DCT) + 128.0
        planes.append(_from_blocks(blocks, hb, wb, h, w))
    if ncomp == 1:
        px = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    elif ncomp == 3:
        px = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    else:
        raise ValueError(f"unsupported component count {ncomp}")
    return {"width": int(w), "height": int(h), "channels": int(ncomp),
            "pixels": px}
