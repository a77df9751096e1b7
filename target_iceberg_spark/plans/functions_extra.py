"""Scalar-function / window / subquery surface, second tier:
date-interval arithmetic, map-typed columns, cumulative shares, and
correlated LATERAL subqueries (SURVEY.md §2B).

Everything here is whole-stage-codegen scalar work or a standard
one-shuffle window/decorrelated-join shape — no new scale risks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "fn_interval",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS due_date,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
           AS qtr_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS INT) AS days_since_t0
FROM orders
""",
    tags=("function", "date", "interval"),
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-interval arithmetic family — month addition with
    end-of-month clamping (add_months), last_day, quarter truncation,
    day deltas. Both engines clamp Jan 31 + 3 months to Apr 30, so the
    outputs are bit-identical; all codegen."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.add_months("o_orderdate", 3).alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("qtr_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .alias("days_since_t0"),
    )


@register(
    "fn_map",
    # the Spark side round-trips props through a MapType column
    # (from_json map<string,int> -> map_keys / element_at /
    # map_contains_key); the oracle checks the VALUES those map ops
    # produce straight from the JSON — mechanism differs, output is
    # the contract
    oracle="""
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       json_extract_string(props, '$.k') IS NOT NULL AS has_k,
       CAST(len(json_keys(props)) AS INT) AS n_keys
FROM events
""",
    tags=("function", "map", "json"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType column surface: parse the props JSON into a true
    map<string,int> column, then drive the map function family —
    map_keys, element_at, map_contains_key, size. At scale a map
    column is the schema-flexible alternative to hundreds of sparse
    typed columns (properties/feature bags); everything here stays
    codegen."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "k").alias("k_value"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.size(m).alias("n_keys"),
    )


@register(
    "win_cumulative_share",
    oracle="""
SELECT o_orderpriority,
       o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_orderpriority
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / SUM(o_totalprice) OVER (PARTITION BY o_orderpriority),
             6) AS cum_share
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-02-01'
""",
    tags=("window", "share"),
)
def win_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running share of the group total (Pareto / cumulative-revenue
    curve): a running sum and the whole-partition total as TWO frames
    over the SAME partitioning, so Spark plans one hashpartitioning
    exchange + one sort and evaluates both frames in a single Window
    operator pass (plan-asserted). Deterministic under date ties via
    the orderkey tie-break; share rounded since the engines sum
    doubles in different orders."""
    orders = load_table(spark, sf_dir, "orders")
    by_prio = Window.partitionBy("o_orderpriority")
    running = by_prio.orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
        )
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(running)
                / F.sum("o_totalprice").over(by_prio),
                6,
            ).alias("cum_share"),
        )
    )


@register(
    "subquery_lateral",
    oracle="""
SELECT c.c_custkey, l.o_orderkey AS best_orderkey,
       ROUND(l.o_totalprice, 2) AS best_price
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 1
) l
""",
    tags=("subquery", "lateral", "sql"),
)
def subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — each customer's single best order
    (top-1 by price, orderkey tie-break). Catalyst DECORRELATES the
    per-row subquery into a join + per-key limit instead of executing
    it N times (plan-asserted: a join appears, no per-row re-scan of
    orders) — the transform that makes lateral viable at 100 TB, where
    a naive nested-loop interpretation would re-scan the fact table
    once per outer row."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey AS best_orderkey,
               ROUND(l.o_totalprice, 2) AS best_price
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 1
        ) l
        """
    )
