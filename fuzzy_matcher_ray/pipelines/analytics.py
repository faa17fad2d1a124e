"""Relational analytics over the TPC-H-ish tables: the multi-table
join-aggregate shape (fact → fact → dimension → tiny dimension).

Not a reference operator per se — the reference's data model is a single
entry table — but the canonical test that the engine's JOIN machinery
(stages/joins.py broadcast-vs-shuffle switch) composes into real query
plans: a user of this repo who also needs reporting-style aggregates over
their corpus metadata should not need a second engine.

Scale shape, stage by stage:
- column-pruned reads (only join keys + measures leave the parquet);
- revenue computed per row in FIXED-POINT int64 (price·(1−disc) is exact
  at 4 decimals, so round(x·10⁴) is an integer — float SUM order can
  never shift the hash check);
- lineitem→orders and →customer attach via ``attach_columns`` (broadcast
  under the row threshold, hash-partitioned shuffle join beyond — the
  10^12-row path);
- per-batch PARTIAL sums by nationkey (25 hot keys would all collide in a
  naive groupby; the combiner reduces each batch to ≤25 rows before the
  tiny global groupby);
- nation names attach from a broadcast dimension at the end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from fuzzy_matcher_ray.stages.joins import attach_columns


def revenue_by_nation(sf_dir: str):
    """(n_name, revenue_e4, n_items) — lineitem revenue Σ price·(1−discount)
    per customer nation, in exact fixed-point (revenue_e4 = revenue·10⁴ as
    int64), item count per nation; sorted by n_name. SQL-checked."""
    from ray.data.aggregate import Sum

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def _rev(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        # price has 2 decimals, discount 2 → the product is exact at 4:
        # round(x·1e4) is an integer on both engines (no .5 ties possible)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_e4": pa.array(rev)})

    rows = li.map_batches(_rev, batch_format="pyarrow")
    rows = attach_columns(rows, rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]),
        "l_orderkey", "o_orderkey", {"o_custkey": "custkey"}, how="inner")
    rows = attach_columns(rows, rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]),
        "custkey", "c_custkey", {"c_nationkey": "nationkey"}, how="inner")

    def _partial(t: pa.Table) -> pa.Table:
        nk = t["nationkey"].to_numpy(zero_copy_only=False)
        rev = t["rev_e4"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(nk, return_inverse=True)
        sums = np.bincount(inv, weights=rev.astype(np.float64))
        # bincount weights go through float64 — exact for |sum| < 2^53,
        # which a per-batch partial of 4-decimal prices never approaches
        cnts = np.bincount(inv)
        return pa.table({"nationkey": pa.array(u),
                         "revenue_e4": pa.array(sums.astype(np.int64)),
                         "n_items": pa.array(cnts.astype(np.int64))})

    partials = rows.map_batches(_partial, batch_format="pyarrow")
    agg = partials.groupby("nationkey").aggregate(
        Sum("revenue_e4", alias_name="revenue_e4"),
        Sum("n_items", alias_name="n_items"))
    out = attach_columns(agg, rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]),
        "nationkey", "n_nationkey", {"n_name": "n_name"}, how="inner")
    return out.select_columns(["n_name", "revenue_e4", "n_items"]) \
        .sort("n_name")


def order_priority_counts(sf_dir: str):
    """(o_orderpriority, n_orders) — orders with at least one lineitem
    received later than committed (TPC-H Q4 shape: EXISTS semi-join →
    distinct-key reduction → tiny groupby). The semi-join side is reduced
    to DISTINCT order keys per batch BEFORE the join (the combiner), so
    the join input is bounded by distinct orders, not lineitems.

    The synthetic lineitem table has no commit/receipt dates, so the
    predicate is the deterministic surrogate ``l_linenumber >= 4`` (late
    lines) — same expression in the SQL oracle."""
    from ray.data.aggregate import Count

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])

    def _late_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        late = t.filter(pc.greater_equal(t["l_linenumber"], 4))
        u = pc.unique(late["l_orderkey"])
        return pa.table({"l_orderkey": u})

    late = li.map_batches(_late_keys, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    # semi-join: late keys may repeat across batches — dedup once via a
    # keyed groupby, then an inner attach keeps only orders with a late line
    late_u = late.groupby("l_orderkey").aggregate(
        Count(alias_name="n_late"))
    hit = attach_columns(orders, late_u, "o_orderkey", "l_orderkey",
                         {"n_late": "n_late"}, how="inner")
    out = hit.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"))
    return out.sort("o_orderpriority")
