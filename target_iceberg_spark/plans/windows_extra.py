"""Range-frame window + timestamp scalar family (SURVEY.md §2B
extensions).

The range frame orders on integer day offsets (Spark range frames need
a numeric ordering column); the 30-day trailing spend is the classic
sliding-aggregate shape. DuckDB computes windowed sums with a segment
tree (different addition order than Spark's running buffer) — the
2-decimal ROUND absorbs the ulp-level difference.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "win_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d,
       COUNT(*) OVER w AS n_orders_30d
FROM orders
WINDOW w AS (
    PARTITION BY o_custkey
    ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
)
""",
    tags=("window",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer: a RANGE frame over day
    offsets (value-based, unlike the ROWS frame in win_running_sum)."""
    orders = load_table(spark, sf_dir, "orders")
    day_off = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy(day_off).rangeBetween(-30, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


@register(
    "fn_timestamp",
    oracle="""
SELECT event_id,
       CAST(hour(CAST(ts AS TIMESTAMP)) AS INT)    AS ev_hour,
       CAST(minute(CAST(ts AS TIMESTAMP)) AS INT)  AS ev_minute,
       CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
       CAST(isodow(CAST(ts AS DATE)) AS INT)       AS iso_dow
FROM events
""",
    tags=("function", "timestamp"),
)
def fn_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp scalar family over the (nanos-sourced) events.ts:
    clock fields, truncated epoch seconds, ISO day-of-week. Spark's
    weekday() is Mon=0, DuckDB's isodow Mon=1 — aligned with +1;
    DuckDB's epoch() is fractional and CAST rounds, so FLOOR matches
    Spark's truncating unix_seconds."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("ev_hour"),
        F.minute("ts").alias("ev_minute"),
        F.expr("unix_seconds(cast(ts as timestamp))").alias("epoch_s"),
        (F.weekday("ts") + F.lit(1)).alias("iso_dow"),
    )
