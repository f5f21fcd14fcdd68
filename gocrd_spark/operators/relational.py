"""Relational join showcases over the TPC-H-ish star schema.

Demonstrates the engine's join strategy at scale:
- dimension tables (nation, region, customer at low SF) are explicitly
  ``broadcast()`` — no shuffle of the fact side for the dim join;
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key and lean
  on AQE for post-shuffle coalescing and skew splits;
- money aggregates emit fixed-point cents (BIGINT) for engine-portable
  comparison (see __spark_entry__ oracle parity rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revenue_by_nation(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Q5-flavored: revenue = sum(l_extendedprice * (1 - l_discount))
    grouped by the ordering customer's nation.

    Plan shape: lineitem ⋈ orders shuffles on orderkey (two fact
    tables); customer and nation ride in as broadcasts.
    """
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
        )
        .join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum(rev) * 100).cast("long").alias("revenue_c"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def segment_order_stats(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Orders per market segment with average total price — a fact ⋈
    broadcast-dim join plus grouped aggregates."""
    joined = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("total_price_c"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


def priority_lineitem_counts(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Q4-flavored: per order priority, how many orders have at least one
    lineitem shipped after the order date (EXISTS -> left-semi join)."""
    late = lineitem.select("l_orderkey", "l_shipdate").alias("l")
    o = orders.alias("o")
    matched = o.join(
        late,
        (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        & (F.col("l.l_shipdate") > F.col("o.o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )