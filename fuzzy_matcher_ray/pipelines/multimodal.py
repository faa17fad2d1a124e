"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernel is a
deterministic STUB (clearly marked) — but the Ray-side plumbing is real and
tested: binary columns flow as Arrow ``binary`` (never through pandas object
dtype), the decoder is an actor-pool ``map_batches`` class (decoder "model"
loaded once per actor in ``__init__``), batch sizes are small because payload
rows are wide, and the output is typed metadata columns.
"""

from __future__ import annotations

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
