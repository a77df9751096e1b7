"""TPC-H-shaped composite pipelines (Q3/Q5/Q10 over the synthetic star
schema) — multi-join + selective predicates + aggregate + top-k in one
plan, the shapes that exercise Catalyst's join ordering, broadcast
selection, partial aggregation and TakeOrderedAndProject together.

At 100 TB: region/nation (fixed-size dims) broadcast; customer joins
shuffle on the fact keys; all predicates sit on base tables so they
push into the parquet scans before any join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

def _revenue() -> F.Column:
    # built lazily — Column construction needs an active SparkContext
    return F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)


@register(
    "q18_large_orders",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("tpch",),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): a self-referential
    HAVING subquery on the fact table. Expressed as aggregate-then-
    semi-join — the big-orderkey list is produced by a map-side-
    combinable groupBy and joined back to lineitem as a LEFT SEMI join,
    so the fact table is scanned twice but never collected; at scale
    both shuffles hash on l_orderkey and AQE can reuse the exchange.
    Threshold 250 (TPC-H uses 300+ at sf>=1; scaled for the small-SF
    testdata per-order quantity distribution)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .where(F.col("_tq") > 250)
        .select("l_orderkey")
    )
    li_big = li.join(big, "l_orderkey", "left_semi")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li_big, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
