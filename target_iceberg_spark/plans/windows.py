"""Window-function plans: ranking, running frames, lag (SURVEY.md §2B).

Window evaluation shuffles once on the partition key then sorts within
partitions. All orderings carry a unique tiebreaker column so both
engines (and Spark run-to-run) see the same row order — without it,
running sums over ties are nondeterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "win_rank",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
    FROM orders
)
WHERE rn <= 3
""",
    tags=("window",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (per-group top-k via row_number)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
""",
    tags=("window",),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend (cumulative frame; deterministic order
    => identical left-to-right double addition in both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "win_lag",
    oracle="""
SELECT event_id, user_id,
       LAG(event_id) OVER w AS prev_event_id,
       ROUND(value - LAG(value) OVER w, 2) AS delta_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window",),
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytics: previous event id + value delta per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_value"),
    )


@register(
    "win_count_distinct",
    oracle="""
SELECT user_id, event_id,
       CAST(COUNT(DISTINCT event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
       ) AS INT) AS types_seen
FROM events
""",
    tags=("window", "distinct"),
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count over a window — Spark has no
    COUNT(DISTINCT) window function; size(collect_set() OVER w) is the
    idiomatic rewrite (the set is bounded by the distinct-value domain,
    here 5 event types, so per-row state stays tiny at any scale)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("types_seen"),
    )


@register(
    "win_first_last",
    oracle="""
SELECT user_id, event_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type)  OVER w AS last_type,
       nth_value(event_type, 2) OVER w AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "navigation"),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions (first/last/nth value over the full
    partition). The frame must be explicitly UNBOUNDED FOLLOWING:
    last_value over the default frame (up to CURRENT ROW) is a classic
    silent-wrong-answer trap in every engine."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )
