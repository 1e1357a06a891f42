"""Relational breadth round 2: outer joins, ROLLUP-style multi-level
aggregates, and PIVOT (conditional wide aggregation).

Reference anchors: the reference's join surface is inner-lookup UPDATEs
(annotation_parquet, howard/objects/variants.py:5845-6428) and its stats
tool emits several grouping levels of the same aggregate as separate
queries (get_stats, variants.py:570-790) — here each shape is ONE streaming
pass: the outer join via Ray Data's native hash-partitioned join, the
rollup via a single partial-aggregate emitting every grouping set, the
pivot via conditional partial sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .util import tbl

SQL: dict[str, str] = {}


def join_left_outer(sf_dir: str):
    """customer LEFT OUTER JOIN orders (native hash-partitioned join):
    per market segment, how many customers, how many with no order at
    all, and the order count — the unmatched-left preservation inner
    joins lose."""
    cust = tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = tbl(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    joined = cust.join(orders, join_type="left_outer", num_partitions=16,
                       on=("c_custkey",), right_on=("o_custkey",))

    def fold(batch: pa.Table) -> pa.Table:
        has = pc.cast(pc.is_valid(batch["o_orderkey"]), pa.int64())
        t = pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "c_custkey": batch["c_custkey"],
            "n_orders": has,
        })
        g = t.group_by(["c_mktsegment", "c_custkey"]).aggregate(
            [("n_orders", "sum")])
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "c_custkey": g["c_custkey"],
                         "n_orders": g["n_orders_sum"]})

    # per-customer fold first (a customer's joined rows land in one hash
    # partition, but map_batches may still split them — regroup exactly)
    per_cust = (joined.map_batches(fold, batch_format="pyarrow")
                .groupby(["c_mktsegment", "c_custkey"])
                .aggregate(Sum("n_orders", alias_name="n_orders"))
                .to_pandas())
    out = (per_cust.groupby("c_mktsegment", as_index=False)
           .agg(n_customers=("c_custkey", "size"),
                n_no_orders=("n_orders", lambda s: int((s == 0).sum())),
                n_orders=("n_orders", "sum")))
    for c in ["n_customers", "n_no_orders", "n_orders"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


SQL["join_left_outer"] = """
WITH per_cust AS (
  SELECT c_mktsegment, c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment, c_custkey)
SELECT c_mktsegment,
       count(*) AS n_customers,
       sum(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END)::BIGINT AS n_no_orders,
       sum(n_orders)::BIGINT AS n_orders
FROM per_cust GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

_ALL = "ALL"  # rollup sentinel instead of SQL NULL: value-hash-stable


def rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) in ONE streaming pass:
    each map_batches partial emits every grouping set's rows (detail,
    per-flag subtotal, grand total), so the shuffle still moves only the
    tiny aggregate keys — the reference's stats report runs one SQL query
    per level (variants.py:603-786); here the levels share the scan."""
    ds = tbl(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice",
              "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        base = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "rev": rev,
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })
        alls = pa.array([_ALL] * batch.num_rows, type=pa.string())
        levels = [
            base,
            base.set_column(1, "l_linestatus", alls),
            base.set_column(0, "l_returnflag", alls)
                .set_column(1, "l_linestatus", alls),
        ]
        g = (pa.concat_tables(levels)
             .group_by(["l_returnflag", "l_linestatus"])
             .aggregate([("rev", "sum"), ("one", "sum")]))
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "l_linestatus": g["l_linestatus"],
                         "rev": g["rev_sum"], "n": g["one_sum"]})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("rev", alias_name="revenue"),
                      Sum("n", alias_name="n"))
           .to_pandas())
    out["revenue"] = out["revenue"].round(2)
    out["n"] = out["n"].astype("int64")
    return (out[["l_returnflag", "l_linestatus", "n", "revenue"]]
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))


SQL["rollup_revenue"] = f"""
SELECT coalesce(l_returnflag, '{_ALL}') AS l_returnflag,
       coalesce(l_linestatus, '{_ALL}') AS l_linestatus,
       count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


_STATUSES = ("F", "O", "P")


def pivot_orders(sf_dir: str):
    """PIVOT: order counts and total price per priority, spread wide over
    order status — conditional partial sums inside map_batches (one
    column set per pivot value), so the wide shape exists from the first
    partial and the shuffle moves |priorities| x |statuses| cells."""
    ds = tbl(sf_dir, "orders",
             ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"o_orderpriority": batch["o_orderpriority"]}
        price = batch["o_totalprice"]
        for s in _STATUSES:
            m = pc.equal(batch["o_orderstatus"], s)
            cols[f"n_{s}"] = pc.cast(m, pa.int64())
            cols[f"price_{s}"] = pc.if_else(m, price, pa.scalar(0.0))
        t = pa.table(cols)
        g = t.group_by("o_orderpriority").aggregate(
            [(c, "sum") for c in cols if c != "o_orderpriority"])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         **{c: g[f"{c}_sum"] for c in cols
                            if c != "o_orderpriority"}})

    aggs = [Sum(f"n_{s}", alias_name=f"n_{s}") for s in _STATUSES] + \
           [Sum(f"price_{s}", alias_name=f"price_{s}") for s in _STATUSES]
    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderpriority").aggregate(*aggs).to_pandas())
    for s in _STATUSES:
        out[f"n_{s}"] = out[f"n_{s}"].astype("int64")
        out[f"price_{s}"] = out[f"price_{s}"].round(2)
    cols = ["o_orderpriority"] + [f"n_{s}" for s in _STATUSES] + \
           [f"price_{s}" for s in _STATUSES]
    return out[cols].sort_values("o_orderpriority").reset_index(drop=True)


SQL["pivot_orders"] = """
SELECT o_orderpriority,
       """ + ",\n       ".join(
    f"count(*) FILTER (o_orderstatus = '{s}') AS n_{s}" for s in _STATUSES
) + """,
       """ + ",\n       ".join(
    f"round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = '{s}'), 0), 2)"
    f" AS price_{s}" for s in _STATUSES
) + """
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
