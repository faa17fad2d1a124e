"""Fuzzy top-k matching over a name column — the reference ``Search`` query
shape (probe → candidates → score → top-k) as a Ray pipeline with an exact
integer-distance oracle.

Probes are deterministic corruptions of real ``part.p_name`` values (OCR-style
digit/letter swaps + a dropped char, mirroring the reference's typo corpora,
``tests/test_data/fuzzy_search_cases.json``). Scoring uses Levenshtein
distance (integer ⇒ exact DuckDB parity via its ``levenshtein`` function);
ranking is (distance asc, p_partkey asc) with top-k per probe
(≙ sort+truncate, fuzzy_matcher_core.go:281-287).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from fuzzy_matcher_ray.functions.similarity import levenshtein

# (probe_id, corruption) — applied to the p_name of partkey == probe_id.
PROBE_SPECS: tuple[tuple[int, str], ...] = ((0, "drop_last"), (1, "swap"),
                                            (2, "ocr"), (3, "drop_first"),
                                            (4, "double"))


def make_probes(sf_dir: str) -> list[tuple[int, str]]:
    """Deterministic probe strings from the first five part names."""
    import duckdb
    con = duckdb.connect()
    rows = con.sql(
        f"select p_partkey, p_name from read_parquet('{sf_dir}/part.parquet') "
        "where p_partkey < 5 order by p_partkey").fetchall()
    con.close()
    probes = []
    for (pk, name), (_, kind) in zip(rows, PROBE_SPECS):
        if kind == "drop_last":
            s = name[:-1]
        elif kind == "swap" and len(name) > 3:
            s = name[0] + name[2] + name[1] + name[3:]
        elif kind == "ocr":
            s = name.replace("o", "0", 1).replace("l", "1", 1)
        elif kind == "drop_first":
            s = name[1:]
        else:
            s = name[0] + name
        probes.append((pk, s))
    return probes


def fuzzy_topk_levenshtein(sf_dir: str, k: int = 3):
    """(probe_id, p_partkey, dist, rnk) — top-k parts per probe by edit
    distance. Broadcast probes (ray.put once), vectorized distance per batch,
    global per-probe top-k via groupby + head(k)."""
    probes = make_probes(sf_dir)
    ref = ray.put(probes)
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name"])

    def _score(t: pa.Table) -> pa.Table:
        pr = ray.get(ref)
        names = t["p_name"].to_pylist()
        keys = t["p_partkey"].to_numpy(zero_copy_only=False)
        out_pid, out_key, out_dist = [], [], []
        for pid, ptext in pr:
            dists = [levenshtein(ptext, nm or "") for nm in names]
            out_pid.extend([pid] * len(names))
            out_key.extend(keys.tolist())
            out_dist.extend(dists)
        return pa.table({"probe_id": pa.array(out_pid, pa.int64()),
                         "p_partkey": pa.array(out_key, pa.int64()),
                         "dist": pa.array(out_dist, pa.int64())})

    scored = parts.map_batches(_score, batch_format="pyarrow", batch_size=4096)

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "p_partkey"]).head(k).reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g
    out = scored.groupby("probe_id").map_groups(_topk, batch_format="pandas")
    return out.sort(["probe_id", "rnk"])
