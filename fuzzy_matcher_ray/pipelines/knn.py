"""Embedding similarity search over the ``embeddings`` table.

- ``knn_topk``: brute-force cosine top-k — the baseline ANN path: the small
  query matrix is broadcast once (``ray.put``), every batch does one numpy
  matmul against it, per-query top-k comes from a global sort+limit.
- ``nearest_neighbor``: per-vector argmax neighbor (embedding-cosine near-dup
  surface: pairs above a cosine threshold = near-dup edges).
- ``knn_topk_ivf``: the scale path — a deterministic LSH/IVF bucketing
  (random-hyperplane signs) prunes candidates before exact scoring, trading
  recall for a ~2^bits candidate reduction; same output schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _read(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    emb = t["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, len(ids))
    return ids, flat.reshape(len(ids), dim)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_topk(sf_dir: str, n_queries: int = 5, k: int = 5):
    """Top-k cosine neighbors for query vectors (vec_id < n_queries) among
    the rest. Returns (query_id, neighbor_id, cosine rounded 6dp) sorted by
    (query_id, -cosine, neighbor_id)."""
    ds = _read(sf_dir)
    q_tbl = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    q_ids = q_tbl["vec_id"].to_numpy()
    q_mat = _normalize_rows(np.stack(q_tbl["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((q_ids, q_mat))

    def _score(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        ids, m = _batch_matrix(t)
        keep = ids >= n_queries
        ids, m = ids[keep], m[keep]
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = _normalize_rows(m) @ qm.T                       # (batch, nq)
        nq = len(qi)
        return pa.table({
            "query_id": pa.array(np.tile(qi, len(ids))),
            "neighbor_id": pa.array(np.repeat(ids, nq)),
            "cosine": pa.array(np.floor(sims.reshape(-1) * 1e6 + 0.5) / 1e6),
        })

    scored = ds.map_batches(_score, batch_format="pyarrow")
    # global top-k per query: sort desc then per-group head(k) via groupby
    def _topk(g):
        import pandas as pd
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        return g
    out = scored.groupby("query_id").map_groups(_topk, batch_format="pandas")
    return out.sort(["query_id", "cosine", "neighbor_id"],
                    descending=[False, True, False])


def nearest_neighbor(sf_dir: str, limit_ids: int = 200):
    """(vec_id, nn_id) — argmax-cosine neighbor for each vec_id < limit_ids.

    O(n·m) brute force via per-batch matmul against a broadcast probe matrix;
    ties broken by smaller nn_id (deterministic).
    """
    ds = _read(sf_dir)
    probes = ds.filter(expr=f"vec_id < {limit_ids}").to_pandas()
    p_ids = probes["vec_id"].to_numpy()
    p_mat = _normalize_rows(np.stack(probes["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((p_ids, p_mat))

    def _score(t: pa.Table) -> pa.Table:
        pi, pm = ray.get(ref)
        ids, m = _batch_matrix(t)
        sims = pm @ _normalize_rows(m).T                       # (np, batch)
        # per probe: best in this batch (exclude self)
        self_mask = pi[:, None] == ids[None, :]
        sims = np.where(self_mask, -2.0, sims)
        best = np.argmax(sims, axis=1)
        return pa.table({
            "vec_id": pa.array(pi),
            "cand_id": pa.array(ids[best]),
            "cosine": pa.array(np.round(sims[np.arange(len(pi)), best], 9)),
        })

    partials = ds.map_batches(_score, batch_format="pyarrow")

    def _best(g):
        import pandas as pd
        g = g.sort_values(["cosine", "cand_id"], ascending=[False, True]).head(1)
        return pd.DataFrame({"vec_id": g["vec_id"].values,
                             "nn_id": g["cand_id"].values})
    out = partials.groupby("vec_id").map_groups(_best, batch_format="pandas")
    return out.sort("vec_id")


def knn_topk_ivf(sf_dir: str, n_queries: int = 5, k: int = 5, bits: int = 2,
                 seed: int = 7):
    """LSH-bucketed ANN: random-hyperplane sign buckets prune candidates.

    A query only scores vectors in its own bucket (multi-probe: plus buckets
    at Hamming distance 1) — at 10^12-vector scale buckets are the shuffle
    key; here the bucket filter runs inline per batch. Recall < 1 by design.
    """
    ds = _read(sf_dir)
    q_tbl = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    q_ids = q_tbl["vec_id"].to_numpy()
    q_mat = _normalize_rows(np.stack(q_tbl["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((q_mat.shape[1], bits))
    q_sig = (q_mat @ planes > 0).astype(np.uint8)
    # multi-probe: accept candidate buckets within Hamming distance 1
    ref = ray.put((q_ids, q_mat, planes, q_sig))

    def _score(t: pa.Table) -> pa.Table:
        qi, qm, pl, qs = ray.get(ref)
        ids, m = _batch_matrix(t)
        keep = ids >= n_queries
        ids, m = ids[keep], m[keep]
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        mn = _normalize_rows(m)
        sig = (mn @ pl > 0).astype(np.uint8)                   # (batch, bits)
        ham = (sig[None, :, :] != qs[:, None, :]).sum(axis=2)  # (nq, batch)
        sims = np.where(ham <= 1, qm @ mn.T, -2.0)
        nq = len(qi)
        mask = sims.reshape(-1) > -2.0
        return pa.table({
            "query_id": pa.array(np.repeat(qi, len(ids))[mask]),
            "neighbor_id": pa.array(np.tile(ids, nq)[mask]),
            "cosine": pa.array(np.floor(sims.reshape(-1)[mask] * 1e6 + 0.5) / 1e6),
        })

    scored = ds.map_batches(_score, batch_format="pyarrow")

    def _topk(g):
        return g.sort_values(["cosine", "neighbor_id"],
                             ascending=[False, True]).head(k)
    out = scored.groupby("query_id").map_groups(_topk, batch_format="pandas")
    return out.sort(["query_id", "cosine", "neighbor_id"],
                    descending=[False, True, False])
