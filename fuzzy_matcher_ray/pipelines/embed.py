"""Text → embedding generation: the signed feature-hashing (hashing-trick)
bag-of-words baseline (Weinberger et al. 2009, "Feature Hashing for Large
Scale Multitask Learning" — the public construction), L2-normalized.

Every embedding-tier operator in this engine (`knn`, `semantic`) consumes
an `embeddings.parquet` artifact; this stage is where that artifact COMES
FROM when the corpus is text — one streaming pass, no model weights, no
shuffle, deterministic to the byte. Real deployments swap the kernel for a
batched neural encoder inside the same actor-pool stage; everything
downstream (ANN, SRP-LSH dedup, SemDeDup) is unchanged because the
artifact contract (``vec_id:int64, embedding:list<float>``) is identical
to the driver testdata's.

Kernel per batch: token → 64-bit hash; bucket = hash mod dim; sign = one
hash bit (the signed variant keeps collisions unbiased); one bincount
over ``doc_of · dim + bucket`` builds the whole batch's count matrix; L2
normalization in float64, then cast to float32 to match the artifact
schema. ``text_embeddings_artifact`` materializes it under a
content-keyed /tmp dir so the file-based knn/semantic operators compose
with it directly (embeddings are checkpoint-style artifacts at scale —
computed once, read by many consumers).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from fuzzy_matcher_ray.functions.shingle import splitmix64
from fuzzy_matcher_ray.pipelines.webtext import _as_array

_EMBED_SEED = np.uint64(0xFEA7)


def embed_documents(sf_dir: str, dim: int = 64):
    """(vec_id, embedding: list<float32>) — hashed unit-norm BoW vectors.

    Empty/null docs embed to the zero vector (kept: downstream cosine ops
    already define zero-vector semantics)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _embed(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(_as_array(t["text"]), "")), " ")
        v = toks.values
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        keep = pc.not_equal(v, "").to_numpy(zero_copy_only=False)
        n_docs = t.num_rows
        mat = np.zeros((n_docs, dim), dtype=np.float64)
        if keep.any():
            # token identity via the shared 64-bit string hash
            from fuzzy_matcher_ray.functions.fingerprint import content_hash
            h = content_hash(v).astype(np.uint64)[keep]
            h = splitmix64(h ^ _EMBED_SEED)
            d = doc_of[keep]
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)).astype(bool), 1.0, -1.0)
            flat = np.bincount(d * dim + bucket, weights=sign,
                               minlength=n_docs * dim)
            mat = flat.reshape(n_docs, dim)
        norms = np.sqrt((mat * mat).sum(axis=1))
        mat = mat / np.maximum(norms, 1e-300)[:, None]
        mat32 = mat.astype(np.float32)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(mat32.ravel()), dim).cast(pa.list_(pa.float32()))
        return pa.table({"vec_id": t["doc_id"], "embedding": emb})

    return docs.map_batches(_embed, batch_format="pyarrow")


def _corpus_fingerprint(sf_dir: str) -> str:
    """SHA-256 over (relative path, size, mtime_ns) of every file under
    ``documents.parquet`` (file or partitioned dir) — a CONTENT key, so
    regenerating a corpus in place invalidates the cache, and distinct
    corpora cannot collide the way a 32-bit path-crc can."""
    import hashlib
    root = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    h = hashlib.sha256()
    if os.path.isdir(root):
        files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root) for f in fs)
    elif os.path.exists(root):
        files = [root]
    else:
        files = []
    h.update(root.encode())
    for p in files:
        st = os.stat(p)
        h.update(f"|{os.path.relpath(p, root)}:{st.st_size}:"
                 f"{st.st_mtime_ns}".encode())
    return h.hexdigest()[:24]


def text_embeddings_artifact(sf_dir: str, dim: int = 64) -> str:
    """Materialize the hashed embeddings as an ``embeddings.parquet``
    artifact dir (content-keyed under /tmp, idempotent) and return the
    dir — the file-based embedding operators (knn.*, semantic.*) take it
    as their ``sf_dir``.

    Cache correctness: the key is a fingerprint of the source corpus's
    file contents (size+mtime of every part), not its path; the parquet
    is written to a tmp name and ``os.replace``d (atomic within /tmp) so
    concurrent builders cannot interleave partial writes; the ``_DONE``
    marker is created LAST, also via replace — a reader that sees the
    marker always sees a complete artifact."""
    key = _corpus_fingerprint(sf_dir)
    out_dir = f"/tmp/fm_ray_embed/v2-{key}-{dim}"
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq
        parts = list(embed_documents(sf_dir, dim).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"))
        tbl = pa.concat_tables(parts) if parts else pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "embedding": pa.array([], pa.list_(pa.float32()))})
        tbl = tbl.take(pc.sort_indices(tbl["vec_id"]))
        final = os.path.join(out_dir, "embeddings.parquet")
        tmp = f"{final}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)
        tmp_m = f"{marker}.tmp.{os.getpid()}"
        with open(tmp_m, "w") as f:
            f.write("ok")
        os.replace(tmp_m, marker)
    return out_dir


def text_knn_topk(sf_dir: str, dim: int = 64, n_queries: int = 5,
                  k: int = 5):
    """Similarity search straight over TEXT: hash-embed → brute cosine
    top-k (the composition proving the embedding tier consumes generated
    artifacts exactly like the driver's)."""
    from fuzzy_matcher_ray.pipelines.knn import knn_topk
    return knn_topk(text_embeddings_artifact(sf_dir, dim),
                    n_queries=n_queries, k=k)


def text_semantic_clusters(sf_dir: str, dim: int = 64, k: int = 8,
                           iters: int = 3):
    """SemDeDup-style semantic clustering straight over TEXT via the
    hashed-embedding artifact."""
    from fuzzy_matcher_ray.pipelines.semantic import semantic_clusters
    return semantic_clusters(text_embeddings_artifact(sf_dir, dim),
                             k=k, iters=iters)
