"""Cumulative-series diagnostics (SURVEY.md §2B time-series tier,
round 6): CUSUM changepoint localization and maximum drawdown.

Both read the same shape — a per-type daily series folded into a
cumulative curve — and answer the two questions monitoring stacks ask
of it: WHERE did the level change (CUSUM, Page 1954, public), and how
far below its running peak did the curve fall (max drawdown, the
standard risk/health metric for any cumulative KPI).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "events_cusum",
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           ROUND(AVG(value), 6) AS x
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
centered AS (
    SELECT event_type, day, x,
           AVG(x) OVER (PARTITION BY event_type) AS m
    FROM daily
),
cusum AS (
    SELECT event_type, day,
           ROUND(SUM(x - m) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS s
    FROM centered
),
ranked AS (
    SELECT event_type, day, s,
           row_number() OVER (
               PARTITION BY event_type ORDER BY abs(s) DESC, day) AS rnk,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
    FROM cusum
)
SELECT event_type, day AS cp_day,
       ROUND(abs(s), 4) AS max_abs_cusum,
       ROUND(s, 4) AS cusum_at_cp,
       n_days
FROM ranked WHERE rnk = 1
ORDER BY event_type
""",
    tags=("timeseries", "changepoint", "events"),
)
def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint localization per event type: cumulative sum
    of the mean-centered daily value series; the day where |CUSUM|
    peaks is the classic single-changepoint estimate (Page 1954 /
    binary-segmentation step, public). events_level_shift flags WHERE
    a windowed level jump clears a threshold; this names the single
    most likely global change day even when no local window sees it.

    Scale shape: the full-data stage is one combinable daily
    pre-aggregation; the centering mean, running sum, and argmax
    window all run over the calendar-bounded (event_type, day) series
    — the whitelisted bounded-window class. Daily means are rounded
    BEFORE the running sum (both engines then fold identical doubles
    in identical day order) and the CUSUM is rounded before the
    argmax rank so the winning day is engine-deterministic."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    by_type = Window.partitionBy("event_type")
    centered = daily.select(
        "event_type", "day", "x", F.avg("x").over(by_type).alias("m")
    )
    run = by_type.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cusum = centered.select(
        "event_type",
        "day",
        F.round(F.sum(F.col("x") - F.col("m")).over(run), 6).alias("s"),
    )
    ranked = cusum.select(
        "event_type",
        "day",
        "s",
        F.row_number()
        .over(by_type.orderBy(F.abs("s").desc(), "day"))
        .alias("rnk"),
        F.count(F.lit(1)).over(by_type).cast("bigint").alias("n_days"),
    )
    return (
        ranked.where(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            F.round(F.abs("s"), 4).alias("max_abs_cusum"),
            F.round("s", 4).alias("cusum_at_cp"),
            "n_days",
        )
        .orderBy("event_type")
    )


@register(
    "events_drawdown",
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           ROUND(SUM(value), 6) AS x
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
curve AS (
    SELECT event_type, day,
           ROUND(SUM(x) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS c
    FROM daily
),
dd AS (
    SELECT event_type, day, c,
           MAX(c) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS peak
    FROM curve
),
ranked AS (
    SELECT event_type, day, c, peak,
           ROUND(peak - c, 6) AS draw,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY ROUND(peak - c, 6) DESC, day) AS rnk
    FROM dd
)
SELECT event_type, day AS trough_day,
       ROUND(draw, 4) AS max_drawdown,
       ROUND(peak, 4) AS peak_value,
       ROUND(c, 4) AS trough_value
FROM ranked WHERE rnk = 1
ORDER BY event_type
""",
    tags=("timeseries", "risk", "events"),
)
def events_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily-value curve per event
    type: running peak minus current cumulative value, maximized over
    the series — the standard answer to "how far did this KPI fall
    from its best before recovering", reported with the trough day
    and the peak/trough curve values.

    Scale shape: one combinable daily pre-aggregation is the only
    full-data stage; the cumulative sum, running max, and argmax
    windows all run over the calendar-bounded (event_type, day)
    series. Daily sums are rounded before the cumulative fold (both
    engines then fold identical doubles in identical day order) and
    the drawdown is rounded before the argmax rank, so the reported
    trough is engine-deterministic. A naive all-pairs
    (peak-day x trough-day) max would be quadratic in days; the
    running-max form is the linear rewrite."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("x"))
    by_type = Window.partitionBy("event_type")
    run = by_type.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    curve = daily.select(
        "event_type", "day", F.round(F.sum("x").over(run), 6).alias("c")
    )
    dd = curve.select(
        "event_type", "day", "c", F.max("c").over(run).alias("peak")
    )
    draw = F.round(F.col("peak") - F.col("c"), 6)
    ranked = dd.select(
        "event_type",
        "day",
        "c",
        "peak",
        draw.alias("draw"),
        F.row_number()
        .over(by_type.orderBy(draw.desc(), "day"))
        .alias("rnk"),
    )
    return (
        ranked.where(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("day").alias("trough_day"),
            F.round("draw", 4).alias("max_drawdown"),
            F.round("peak", 4).alias("peak_value"),
            F.round("c", 4).alias("trough_value"),
        )
        .orderBy("event_type")
    )
