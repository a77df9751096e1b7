"""Event-time window plans, batch-expressible (SURVEY.md §2B).

window() and session_window() are the same operators Structured
Streaming uses — running them in batch mode makes them oracle-
checkable (DuckDB sessionizes with the lag/gap/cumsum idiom). The true
streaming wrappers (readStream + watermark + foreachBatch into the
writer) live in streaming/pipeline.py with construction-equivalence
tests instead of a SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "stream_tumbling",
    oracle="""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming",),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event type. Epoch-aligned
    window() == date_trunc('hour') for the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value"
        )
    )


@register(
    "stream_session",
    oracle="""
WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
g AS (
    SELECT *,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT *,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM g
)
SELECT user_id,
       MIN(ts) AS sess_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM s
GROUP BY user_id, sid
""",
    tags=("streaming",),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user. Spark merges an event
    into the open session iff gap < 30min (session end exclusive); the
    DuckDB oracle reproduces that with lag/cumsum sessionization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            "n_events",
            "sum_value",
        )
    )
