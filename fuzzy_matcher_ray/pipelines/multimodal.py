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
import pyarrow.compute as pc
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


# ---------------------------------------------------------------------------
# perceptual image dedup: dHash over the real decoders + Hamming banding
# ---------------------------------------------------------------------------

def synth_image_payload(doc_id: int) -> bytes:
    """Deterministic image payload per doc id with PLANTED near-dup
    clusters: docs in the same group of four (``doc_id // 4``) whose group
    index is even share one smooth base image and differ only by encoding —
    member 0 PPM at native size, member 1 PNG of the SAME pixels (pixel-
    identical ⇒ dHash-identical), member 2 box-resized to ~80% then
    PPM-encoded (near), member 3 a baseline-JPEG re-encode (near). Odd
    groups are four unrelated images. Base images are random coarse grids
    upsampled bilinearly — smooth at pixel scale (so resize/codec noise
    survives the hash: dHash of white noise is meaningless at ANY scale)
    yet random at the 8×8 hash-cell scale (so unrelated images land far
    apart in Hamming space)."""
    from fuzzy_matcher_ray.functions import jpeg, media
    group, member = doc_id // 4, doc_id % 4
    # disjoint seed spaces: an even group's shared base must never equal
    # an odd-group member whose doc_id happens to match the group index
    seed = (group << 1) if group % 2 == 0 else ((doc_id << 1) | 1)
    h = int(splitmix64(np.array([seed], dtype=np.uint64))[0])
    # dims divisible by 45×40 factors so the 9×8 hash partition, the 4/5
    # resize partition and the cell grid all align exactly (the resized
    # member's cell means then equal the base's — no boundary mixing)
    w, ht = 45 * (1 + h % 2), 40 * (1 + (h >> 8) % 2)
    # 8×9 random luma grid — one cell per dHash cell, upsampled piecewise-
    # constant on EXACTLY the hash kernel's box partition (bounds
    # ⌊r·dim/8⌋), so the base image's cell means equal the grid values.
    # Levels are 25 apart with a +12 checkerboard, so horizontally
    # adjacent cells ALWAYS differ by ≥ 12 luma — resize/codec noise
    # (≪ 12 here) cannot flip a hash bit, while per-cell randomness keeps
    # unrelated images ~32 bits apart.
    stream = splitmix64(np.uint64(seed & 0xFFFFFFFF) * np.uint64(2654435761)
                        + np.arange(72, dtype=np.uint64))
    levels = (stream % np.uint64(10)).astype(np.float64).reshape(8, 9)
    checker = (np.add.outer(np.arange(8), np.arange(9)) % 2) * 12.0
    if group % 2 == 0 and member == 3:
        # the "slightly edited re-crawl" member: one interior cell's level
        # shifts — at most the cell's two horizontal comparisons flip, so
        # the planted Hamming distance is in [0, 2] (a TRUE near-dup, not
        # an exact hash twin like the PNG/resize members)
        r3, c3 = 1 + (h >> 16) % 6, 1 + (h >> 20) % 7
        levels[r3, c3] = (levels[r3, c3] + 5) % 10
    coarse = levels * 25.0 + 5.0 + checker
    row_of = (np.arange(ht) * 8) // ht
    col_of = (np.arange(w) * 9) // w
    lum = coarse[row_of[:, None], col_of[None, :]]
    # channels: monotone per-channel transforms of the SAME field (no
    # spatial shift — a shifted channel would decouple the Rec.601 luma
    # from the planted cell structure)
    px = np.clip(np.stack([lum, lum * 0.95 + 8.0, lum * 0.9 + 16.0],
                          axis=-1), 0, 255).astype(np.uint8)
    if group % 2 == 1:                       # unrelated image per member
        return media.make_ppm(px)
    if member == 0:
        return media.make_ppm(px)
    if member == 1:
        return media.make_png(px)
    if member == 2:
        ow, oh = (w * 4) // 5, (ht * 4) // 5
        small = np.empty((oh, ow, 3), dtype=np.uint8)
        for c in range(3):
            small[..., c] = np.clip(media.box_mean_gray(
                px[..., c], ow, oh), 0, 255).astype(np.uint8)
        return media.make_ppm(small)
    return jpeg.make_jpeg(px, quality=90)


class ImageHasher:
    """Actor-pool perceptual-hash stage: image payload → (doc_id,
    dhash: int64). Decoders built once per actor; per-payload decode is
    inherent (same honest cost as MediaDecoder); the hash kernel itself is
    one vectorized integral-image pass (functions/media.dhash64).
    Non-image / malformed payloads are dead-lettered with a null hash."""

    def __init__(self):
        from fuzzy_matcher_ray.functions import jpeg, media
        self.media = media
        self.jpeg = jpeg

    def _one(self, buf: bytes):
        m = self.media
        try:
            if buf.startswith(m.PPM_MAGIC):
                px = m.parse_ppm(buf)["pixels"]
            elif buf.startswith(m.PNG_MAGIC):
                px = m.parse_png(buf)["pixels"]
            elif buf.startswith(self.jpeg.JPEG_MAGIC):
                px = self.jpeg.parse_jpeg(buf)["pixels"]
            else:
                return None
            return np.int64(np.uint64(m.dhash64(px)))
        except (ValueError, struct.error):
            return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        hashes = [self._one(b.as_py() or b"") for b in payload]
        return pa.table({"doc_id": batch["doc_id"],
                         "dhash": pa.array(hashes, pa.int64())})


def _image_payload_ds(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array([synth_image_payload(int(i)) for i in ids],
                                pa.binary()),
        })

    return ds.map_batches(_attach, batch_format="pyarrow")


def image_dhash(sf_dir: str):
    """(doc_id, dhash) over the synthesized image column — the perceptual
    fingerprint pass every image-dedup pipeline runs first."""
    out = _image_payload_ds(sf_dir).map_batches(
        ImageHasher, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4))
    return out.sort("doc_id")


def hamming_dup_pairs(hashed, hash_col: str, max_hamming: int = 3,
                      _sorted: bool = True,
                      degenerate_group_max: int = 64):
    """Near-dup pairs of any 64-bit perceptual-hash column: Manku
    block-combination banding + exact Hamming verify.

    Complete for Hamming ≤ 3 by the same pigeonhole guarantee as the text
    SimHash pass (functions/simhash.simhash_combo_keys: 6 pieces choose 3
    ⇒ any ≤3-bit damage leaves one combination key intact); candidates
    co-locate via the shared skew-capped pair machinery and are verified
    with the vectorized SWAR popcount. Wide payloads never shuffle — only
    slim (combo, key, doc_id, hash) rows leave the hash stage. Shared by
    the image-dHash and audio-envelope dedup tiers.

    **Degenerate-hash guard**: real crawls carry mass-produced identical
    perceptual hashes (blank/uniform images hash to dhash 0, silent audio
    to envelope 0). An exact-hash value shared by more than
    ``degenerate_group_max`` docs is collapsed BEFORE banding: its members
    emit star pairs (min-doc_id rep ↔ member; Hamming 0 by construction)
    directly, and only the rep enters the banding stage. Connected
    components are unchanged (every member sits at distance 0 from the
    rep, so any band edge a member would contribute, the rep contributes),
    so the pair output is *cluster-complete*; within-group pair
    enumeration is intentionally star-shaped above the threshold — that
    O(n²) explode is exactly the skew blow-up this guard removes. Below
    the threshold, all-pairs output is unchanged.

    Banding itself keeps ``max_band_group`` effectively unbounded
    (1 << 30): a hot-key star/chain rewrite inside a band would be
    Hamming-verified pairwise and silently drop transitive ≤3-bit links,
    so the ≤3 completeness guarantee requires the full band explode —
    safe once identical-hash mass is collapsed, because a band group then
    holds only DISTINCT hashes agreeing on 3 of 6 blocks.
    """
    from dataclasses import replace

    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.functions.simhash import (hamming64,
                                                     simhash_combo_keys)
    from fuzzy_matcher_ray.stages.candidates import key_pairs
    if max_hamming > 3:
        raise ValueError("banding guarantees completeness only to 3 bits")

    valid = hashed.map_batches(
        lambda t: t.filter(pc.is_valid(t[hash_col])),
        batch_format="pyarrow")
    # slim rows (doc_id + hash = 16 B) — pin so the degenerate-count pass
    # and the banding pass don't re-run the upstream decode
    valid = valid.materialize()

    # degenerate exact-hash values: rep per hash via groupby.min — the
    # result is one row per DEGENERATE hash value, tiny by construction
    # (> threshold members each), so it broadcasts as a plain dict.
    from ray.data.aggregate import Count, Min
    counts = valid.groupby(hash_col).aggregate(
        Count(alias_name="_n"), Min("doc_id", alias_name="_rep"))
    thresh = int(degenerate_group_max)
    degen_parts = list(counts.map_batches(
        lambda t: t.filter(pc.greater(t["_n"], pa.scalar(thresh))),
        batch_format="pyarrow").select_columns(
            [hash_col, "_rep"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"))
    rep_of = {}
    if degen_parts:
        degen_tbl = pa.concat_tables(degen_parts)
        rep_of = dict(zip(degen_tbl[hash_col].to_pylist(),
                          degen_tbl["_rep"].to_pylist()))

    star_parts = []
    if rep_of:
        import ray
        rep_ref = ray.put(rep_of)

        def _split(t: pa.Table) -> pa.Table:
            """Drop degenerate non-rep members; they pair via the star."""
            reps = ray.get(rep_ref)
            h = t[hash_col].to_numpy(zero_copy_only=False)
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            is_degen = np.isin(h, np.fromiter(reps, np.int64,
                                              count=len(reps)))
            is_rep = np.zeros(len(h), dtype=bool)
            if is_degen.any():
                rep_ids = np.array([reps[int(x)] for x in h[is_degen]],
                                   dtype=np.int64)
                is_rep[np.nonzero(is_degen)[0]] = \
                    d[is_degen] == rep_ids
            return t.filter(pa.array(~is_degen | is_rep))

        def _stars(t: pa.Table) -> pa.Table:
            reps = ray.get(rep_ref)
            h = t[hash_col].to_numpy(zero_copy_only=False)
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            is_degen = np.isin(h, np.fromiter(reps, np.int64,
                                              count=len(reps)))
            hh, dd = h[is_degen], d[is_degen]
            rep_ids = np.array([reps[int(x)] for x in hh], dtype=np.int64)
            keep = dd != rep_ids
            return pa.table({"a": pa.array(rep_ids[keep]),
                             "b": pa.array(dd[keep], pa.int64())})

        star_parts.append(valid.map_batches(_stars,
                                            batch_format="pyarrow"))
        band_input = valid.map_batches(_split, batch_format="pyarrow")
    else:
        band_input = valid

    def _bands(t: pa.Table) -> pa.Table:
        sim = t[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        keys, n_combos = simhash_combo_keys(sim, r=3)
        n = len(sim)
        return pa.table({
            "combo": pa.array(np.repeat(np.arange(n_combos, dtype=np.int8),
                                        n)),
            "key": pa.array(keys.T.ravel().view(np.int64)),
            "doc_id": pa.array(np.tile(
                t["doc_id"].to_numpy(zero_copy_only=False), n_combos)),
            "phash": pa.array(np.tile(sim.view(np.int64), n_combos)),
        })

    rows = band_input.map_batches(_bands, batch_format="pyarrow")

    def _hamming_filter(t: pa.Table) -> pa.Table:
        d = hamming64(
            t["phash_a"].to_numpy(zero_copy_only=False).view(np.uint64),
            t["phash_b"].to_numpy(zero_copy_only=False).view(np.uint64))
        return t.filter(pa.array(d <= max_hamming))

    out = key_pairs(rows, ["combo", "key"],
                    replace(PipelineConfig(), max_band_group=1 << 30),
                    carry_cols=["phash"], pair_filter=_hamming_filter)
    for sp in star_parts:
        out = out.union(sp)
    return out.sort(["a", "b"]) if _sorted else out


def image_dup_pairs(sf_dir: str, max_hamming: int = 3, _sorted: bool = True):
    """Perceptual near-dup image pairs: dHash through the shared
    Hamming-banding machinery (``hamming_dup_pairs``)."""
    return hamming_dup_pairs(image_dhash(sf_dir), "dhash", max_hamming,
                             _sorted)


def image_dup_clusters(sf_dir: str, max_hamming: int = 3):
    """Connected components over the perceptual pair graph — the image
    analogue of the text flagship's (doc_id, cluster_id) contract
    (singletons keep their own id)."""
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.stages.cluster import cluster_edges
    edges = image_dup_pairs(sf_dir, max_hamming, _sorted=False)
    nodes = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    return cluster_edges(edges, nodes, PipelineConfig()).sort("doc_id")


# ---------------------------------------------------------------------------
# audio fingerprint dedup: energy-envelope hash over the real WAV decoder
# ---------------------------------------------------------------------------

def synth_audio_payload(doc_id: int) -> bytes:
    """Deterministic WAV payload per doc id with PLANTED near-dup
    clusters (the audio twin of ``synth_image_payload``): even groups of
    four share one 65-segment amplitude envelope — member 0 the base
    tone, member 1 gain-scaled ×0.5 (envelope-hash invariant), member 2
    resampled 2× by linear interpolation (invariant: per-segment RMS is
    time-normalized and the box partitions align at 2n), member 3 a
    one-segment amplitude edit (true Hamming ≤ 2). Odd groups are four
    unrelated envelopes. Amplitudes use gapped levels (+ an alternating
    offset) so adjacent segments can never tie — codec/rounding noise
    cannot flip a bit."""
    from fuzzy_matcher_ray.functions import media
    group, member = doc_id // 4, doc_id % 4
    seed = (group << 1) if group % 2 == 0 else ((doc_id << 1) | 1)
    stream = splitmix64(np.uint64(seed & 0xFFFFFFFF) * np.uint64(0x9E3779B1)
                        + np.arange(65, dtype=np.uint64))
    levels = (stream % np.uint64(10)).astype(np.float64)
    if group % 2 == 0 and member == 3:
        i3 = 1 + int(stream[0] >> np.uint64(32)) % 63
        levels[i3] = (levels[i3] + 5) % 10
    amps = levels * 700.0 + 500.0 + (np.arange(65) % 2) * 350.0
    seg_len, rate = 64, 8000
    n = 65 * seg_len
    t = np.arange(n, dtype=np.float64)
    carrier = np.sin(2 * np.pi * t / 16.0)        # 4 full periods / segment
    samples = (np.repeat(amps, seg_len) * carrier)
    if group % 2 == 0 and member == 1:
        samples = samples * 0.5
    if group % 2 == 0 and member == 2:
        up = np.empty(2 * n, dtype=np.float64)
        up[0::2] = samples
        up[1::2] = (samples + np.append(samples[1:], samples[-1])) / 2.0
        samples, rate = up, 16000
    return media.make_wav(samples.astype(np.int16), rate)


class AudioHasher:
    """Actor-pool fingerprint stage: WAV payload → (doc_id, ahash: int64)
    via the 65-segment energy-envelope hash. Non-WAV / malformed payloads
    dead-letter with a null hash."""

    def __init__(self):
        from fuzzy_matcher_ray.functions import media
        self.media = media

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.media
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        out = []
        for b in payload:
            buf = b.as_py() or b""
            if not buf.startswith(m.WAV_MAGIC):
                out.append(None)
                continue
            try:
                w = m.parse_wav(buf)
                out.append(np.int64(np.uint64(
                    m.envelope_hash64(w["samples"]))))
            except (ValueError, struct.error):
                out.append(None)
        return pa.table({"doc_id": batch["doc_id"],
                         "ahash": pa.array(out, pa.int64())})


def audio_fingerprint(sf_dir: str):
    """(doc_id, ahash) over the synthesized audio column."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array([synth_audio_payload(int(i)) for i in ids],
                                pa.binary())})

    return ds.map_batches(_attach, batch_format="pyarrow") \
        .map_batches(AudioHasher, batch_format="pyarrow", batch_size=256,
                     concurrency=(1, 4)).sort("doc_id")


def audio_dup_pairs(sf_dir: str, max_hamming: int = 3, _sorted: bool = True):
    """Audio near-dup pairs: envelope hash through the shared
    Hamming-banding machinery (``hamming_dup_pairs``)."""
    return hamming_dup_pairs(audio_fingerprint(sf_dir), "ahash",
                             max_hamming, _sorted)


def audio_dup_clusters(sf_dir: str, max_hamming: int = 3):
    """Connected components over the audio fingerprint pair graph — same
    (doc_id, cluster_id) contract as the image and text tiers."""
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.stages.cluster import cluster_edges
    edges = audio_dup_pairs(sf_dir, max_hamming, _sorted=False)
    nodes = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    return cluster_edges(edges, nodes, PipelineConfig()).sort("doc_id")
