"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode is REAL for WAV, PPM, PNG (functions/media — pure numpy/struct,
stdlib zlib) and baseline JPEG (functions/jpeg — marker parse, canonical
Huffman, vectorized IDCT); only formats the container has no library for
AND no stdlib path to (MP3/H.264) remain behind a clearly-marked stub. The
Ray-side plumbing
is the product surface either way: binary columns flow as Arrow ``binary``
(never through pandas object dtype), decoders are actor-pool ``map_batches``
classes (decoder "model" loaded once per actor in ``__init__``), batch sizes
are small because payload rows are wide, and the output is typed metadata
columns.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

from fuzzy_matcher_ray.functions.shingle import splitmix64, string_buffer


class StubImageDecoder:
    """Actor-pool decode stage: binary payload → (n_bytes, width, height).

    REAL decode is NotImplemented in this sandbox (no codec libs); the stub
    derives deterministic fake dimensions from a payload hash so tests can
    assert the plumbing (schema, batching, actor signature) end-to-end.
    Swap ``_decode_batch`` for a PIL/libvips call in a real deployment.
    """

    def __init__(self, real_codecs: bool = False):
        if real_codecs:
            raise NotImplementedError(
                "no image codec libraries in this environment — stub only")
        self.real = real_codecs

    def _decode_batch(self, payloads: pa.Array) -> dict[str, np.ndarray]:
        data, offsets = string_buffer(payloads)
        n_bytes = (offsets[1:] - offsets[:-1]).astype(np.int64)
        h = splitmix64(n_bytes.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        width = (h % np.uint64(1920)).astype(np.int64) + 16
        height = ((h >> np.uint64(32)) % np.uint64(1080)).astype(np.int64) + 16
        return {"n_bytes": n_bytes, "width": width, "height": height}

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        meta = self._decode_batch(payload)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bytes": pa.array(meta["n_bytes"]),
            "width": pa.array(meta["width"]),
            "height": pa.array(meta["height"]),
        })


class MediaDecoder:
    """Actor-pool decode stage with REAL decoders for WAV PCM, PPM (pure
    numpy/struct), PNG (stdlib zlib inflate + numpy unfilter —
    functions/media.parse_png) and baseline JPEG (functions/jpeg —
    canonical Huffman + vectorized IDCT, no codec library). Only MP3/H.264
    remain honestly unknown (no library, no practical stdlib decoder).
    Malformed payloads are dead-lettered (kind="error"), never crash the
    stage.

    Output per row: (doc_id, kind, n_bytes, width, height, channels,
    sample_rate, duration_ms, feature) — ``feature`` is a real computed
    signal: RMS amplitude for audio, mean Rec.601 luma for images.
    """

    def __init__(self):
        # per-actor init: dispatch table built once (≙ codec/model load)
        from fuzzy_matcher_ray.functions import jpeg, media
        self.media = media
        self.jpeg = jpeg

    def _one(self, buf: bytes) -> tuple:
        m = self.media
        try:
            if buf.startswith(m.WAV_MAGIC):
                w = m.parse_wav(buf)
                return ("wav", None, None, w["channels"], w["sample_rate"],
                        w["duration_ms"], m.wav_rms(w["samples"]))
            if buf.startswith(m.PPM_MAGIC):
                p = m.parse_ppm(buf)
                return ("ppm", p["width"], p["height"], None, None, None,
                        m.ppm_mean_luma(p["pixels"]))
            if buf.startswith(m.PNG_MAGIC):
                p = m.parse_png(buf)
                return ("png", p["width"], p["height"], None, None, None,
                        m.ppm_mean_luma(p["pixels"]))
            if buf.startswith(self.jpeg.JPEG_MAGIC):
                p = self.jpeg.parse_jpeg(buf)
                px = p["pixels"]
                luma = (float(px.mean()) if px.ndim == 2
                        else m.ppm_mean_luma(px))
                return ("jpeg", p["width"], p["height"], p["channels"],
                        None, None, luma)
            # remaining codec formats (MP3/H.264) would dispatch to
            # libsndfile/ffmpeg here — absent in this sandbox, so: honestly
            # unknown, not fake-decoded
            return ("unknown", None, None, None, None, None, None)
        except (ValueError, struct.error) as e:
            return ("error", None, None, None, None, None, None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        data, offsets = string_buffer(payload)
        n_bytes = (offsets[1:] - offsets[:-1]).astype(np.int64)
        rows = [self._one(b.as_py() or b"") for b in payload]
        cols = list(zip(*rows)) if rows else [[]] * 7
        return pa.table({
            "doc_id": batch["doc_id"],
            "kind": pa.array(cols[0], pa.string()),
            "n_bytes": pa.array(n_bytes),
            "width": pa.array(cols[1], pa.int64()),
            "height": pa.array(cols[2], pa.int64()),
            "channels": pa.array(cols[3], pa.int64()),
            "sample_rate": pa.array(cols[4], pa.int64()),
            "duration_ms": pa.array(cols[5], pa.int64()),
            "feature": pa.array(cols[6], pa.float64()),
        })


def synth_media_payload(doc_id: int) -> bytes:
    """Deterministic media payload per doc id — the sandbox stand-in for a
    real binary media column: WAV for ``id % 4 == 0``, PPM for ``1``, PNG
    for ``2`` (filters derived from the id, so every PNG scanline-filter
    branch gets exercised), baseline JPEG for ``3`` (grayscale or color by
    an id-hash bit, so both SOF0 component layouts get exercised).
    Parameters derive from the id, so tests can assert exact decode
    round-trips (bit-exact for the lossless formats; quantization-bounded
    against the re-synthesized payload for JPEG)."""
    from fuzzy_matcher_ray.functions import jpeg, media
    h = int(splitmix64(np.array([doc_id], dtype=np.uint64))[0])
    kind = doc_id % 4
    if kind == 0:
        rate = 8000 + (h % 4) * 4000                  # 8/12/16/20 kHz
        n = 200 + (h >> 8) % 800
        t = np.arange(n, dtype=np.float64)
        freq = 100.0 + (h >> 16) % 400
        samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
        return media.make_wav(samples, rate)
    w = 8 + (h % 64)
    ht = 8 + ((h >> 8) % 48)
    px = ((np.arange(w * ht * 3, dtype=np.uint64) * np.uint64(h & 0xFFFF))
          % np.uint64(251)).astype(np.uint8).reshape(ht, w, 3)
    if kind == 1:
        return media.make_ppm(px)
    if kind == 2:
        return media.make_png(px, filters=[(h >> 16) % 5, (h >> 20) % 5, 4, 3])
    quality = 80 + (h >> 24) % 18                     # 80..97
    if (h >> 28) & 1:                                 # grayscale SOF0
        return jpeg.make_jpeg(px[..., 0], quality=quality)
    return jpeg.make_jpeg(px, quality=quality)


def decode_media_docs(sf_dir: str):
    """Real-decode pipeline over a synthesized media column: per-doc
    WAV/PPM/PNG/JPEG payloads (deterministic from doc_id), decoded by the
    MediaDecoder actor pool. Output (doc_id, kind, n_bytes, width, height,
    channels, sample_rate, duration_ms, feature) sorted by doc_id."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _attach_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array([synth_media_payload(int(i)) for i in ids],
                                pa.binary()),
        })

    binary_ds = ds.map_batches(_attach_payload, batch_format="pyarrow")
    out = binary_ds.map_batches(MediaDecoder, batch_format="pyarrow",
                                batch_size=256, concurrency=(1, 4))
    return out.sort("doc_id")


def decode_binary_docs(sf_dir: str):
    """documents.text encoded to a binary payload column, then decoded by the
    actor-pool stub. Output (doc_id, n_bytes, width, height) sorted.

    ``n_bytes`` has an exact SQL oracle (octet_length); width/height are
    stub-deterministic (rows-only interest).
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _to_binary(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "payload": t["text"].cast(pa.binary())})

    binary_ds = ds.map_batches(_to_binary, batch_format="pyarrow")
    # small batches: payload rows are wide (images would be MBs each)
    out = binary_ds.map_batches(StubImageDecoder, fn_constructor_args=(False,),
                                batch_format="pyarrow", batch_size=256,
                                concurrency=(1, 4))
    return out.sort("doc_id")


class ImageResizer:
    """Actor-pool resize stage: image payload → resized payload + dims.

    REAL nearest-neighbor resize (functions/media.resize_nearest) for all
    three decodable image formats — PPM, PNG and baseline JPEG (re-encoded
    in their own format, so downstream stages consume the same
    opaque-binary column shape they were given; JPEG re-encode is lossy by
    nature, tests bound the error by the quantization tables). Non-image
    and malformed payloads are dead-lettered (kind="error"/"skip"), never
    crash the stage.
    """

    def __init__(self, max_dim: int = 32):
        from fuzzy_matcher_ray.functions import jpeg, media
        self.media = media
        self.jpeg = jpeg
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.media
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        kinds, ws, hs, ows, ohs, outs = [], [], [], [], [], []
        for b in payload:
            buf = b.as_py() or b""
            if buf.startswith(m.PPM_MAGIC):
                kind, parse, enc = "ppm", m.parse_ppm, m.make_ppm
            elif buf.startswith(m.PNG_MAGIC):
                kind, parse, enc = "png", m.parse_png, m.make_png
            elif buf.startswith(self.jpeg.JPEG_MAGIC):
                kind, parse = "jpeg", self.jpeg.parse_jpeg
                enc = lambda px: self.jpeg.make_jpeg(px, quality=92)
            else:
                kinds.append("skip"); ws.append(None); hs.append(None)
                ows.append(None); ohs.append(None); outs.append(None)
                continue
            try:
                p = parse(buf)
                ow, oh = m.fit_within(p["width"], p["height"], self.max_dim)
                px = p["pixels"]
                if px.ndim == 2:                     # grayscale JPEG
                    px = m.resize_nearest(
                        np.repeat(px[..., None], 3, axis=-1), ow, oh)[..., 0]
                else:
                    px = m.resize_nearest(px, ow, oh)
                kinds.append(kind); ws.append(p["width"]); hs.append(p["height"])
                ows.append(ow); ohs.append(oh); outs.append(enc(px))
            except ValueError:
                kinds.append("error"); ws.append(None); hs.append(None)
                ows.append(None); ohs.append(None); outs.append(None)
        return pa.table({
            "doc_id": batch["doc_id"],
            "kind": pa.array(kinds, pa.string()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "out_width": pa.array(ows, pa.int64()),
            "out_height": pa.array(ohs, pa.int64()),
            "payload_out": pa.array(outs, pa.binary()),
        })


class AudioFramer:
    """Actor-pool frame-sampling stage: WAV payload → one row per sampled
    frame (doc_id, frame_idx, t_ms, rms). The flat-map shape — a wide
    binary row fans out to many slim typed rows — is the video
    frame-extraction pattern with audio standing in for the codec-less
    sandbox. Vectorized per payload (functions/media.frame_windows)."""

    def __init__(self, win_ms: int = 25, hop_ms: int = 100):
        from fuzzy_matcher_ray.functions import media
        self.media = media
        self.win_ms = win_ms
        self.hop_ms = hop_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.media
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_fi, out_t, out_rms = [], [], [], []
        for i, b in enumerate(payload):
            buf = b.as_py() or b""
            if not buf.startswith(m.WAV_MAGIC):
                continue
            try:
                w = m.parse_wav(buf)
            except ValueError:
                continue
            t_ms, rms = m.frame_windows(w["samples"], w["sample_rate"],
                                        self.win_ms, self.hop_ms)
            k = len(t_ms)
            if k == 0:
                continue
            out_id.append(np.full(k, ids[i], dtype=np.int64))
            out_fi.append(np.arange(k, dtype=np.int64))
            out_t.append(t_ms)
            out_rms.append(rms)
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "frame_idx": pa.array([], pa.int64()),
                             "t_ms": pa.array([], pa.float64()),
                             "rms": pa.array([], pa.float64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id)),
            "frame_idx": pa.array(np.concatenate(out_fi)),
            "t_ms": pa.array(np.concatenate(out_t)),
            "rms": pa.array(np.concatenate(out_rms)),
        })


def _media_payload_ds(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array([synth_media_payload(int(i)) for i in ids],
                                pa.binary()),
        })

    return ds.map_batches(_attach, batch_format="pyarrow")


def resize_media_docs(sf_dir: str, max_dim: int = 32):
    """Resize pipeline over the synthesized media column (PPM, PNG and
    JPEG docs resized for real, WAV docs dead-lettered as kind="skip"). Output
    excludes the binary payload (slim typed metadata only) sorted by
    doc_id."""
    out = _media_payload_ds(sf_dir).map_batches(
        ImageResizer, fn_constructor_args=(max_dim,),
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
    return out.select_columns(["doc_id", "kind", "width", "height",
                               "out_width", "out_height"]).sort("doc_id")


def frame_media_docs(sf_dir: str, win_ms: int = 25, hop_ms: int = 100):
    """Frame-sampling pipeline over the synthesized media column (WAV docs
    fan out to per-frame rows; image docs contribute none). Sorted by
    (doc_id, frame_idx)."""
    out = _media_payload_ds(sf_dir).map_batches(
        AudioFramer, fn_constructor_args=(win_ms, hop_ms),
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
    return out.sort(["doc_id", "frame_idx"])
