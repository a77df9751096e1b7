"""Theil–Sen robust trend estimation (SURVEY.md §2B stats tier,
round 9).

The robust counterpart of agg_regression's OLS slope: the MEDIAN of
all pairwise slopes (Theil 1950 / Sen 1968, public) has a 29%
breakdown point, so a corrupted day (logging outage, bot flood)
cannot drag the trend the way it drags least squares. The classic
O(n²) pair set is tamed the same way every time-series query in the
tier tames scale: the series is CALENDAR-BOUNDED — daily aggregates
of the events stream — so "all pairs" is pairs of days, a constant
~n_days² regardless of event volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "agg_theil_sen",
    oracle="""
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
           ROUND(SUM(value), 6) AS y
    FROM events GROUP BY 1
),
pairs AS (
    SELECT (b.y - a.y) / CAST(b.d - a.d AS DOUBLE) AS slope
    FROM daily a JOIN daily b ON a.d < b.d
),
est AS (
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           quantile_cont(slope, 0.5) AS slope
    FROM pairs
)
SELECT n_days, n_pairs,
       ROUND(slope, 6) AS slope_per_day,
       ROUND((SELECT quantile_cont(y - slope * (d - DATE '2024-01-01'), 0.5)
              FROM daily, est), 6) AS intercept
FROM est
""",
    tags=("stats", "timeseries", "robust"),
)
def agg_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the daily-revenue trend: median pairwise
    slope over the daily SUM(value) series, plus the companion median
    intercept (median of y - slope·x, x = days since 2024-01-01).
    Daily sums are ROUND()ed to 6 dp in BOTH arms before any slope
    arithmetic so engine-order summation ulps cannot reorder the
    slope ranks (the registry's double-aggregate convention).

    Scale shape: ONE combinable daily aggregate is the only
    event-volume stage; the pairwise self-join and both medians run
    on the calendar-bounded day frame (30 days here; even a decade is
    ~3.7k days, ~6.7M pairs — a constant, not a data term). The
    intercept reuses the one-row estimate crossed onto the day
    frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts").cast("timestamp"))
        .cast("date")
        .alias("d")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (
            (F.col("b.y") - F.col("a.y"))
            / F.datediff(F.col("b.d"), F.col("a.d")).cast("double")
        ).alias("slope")
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    est = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.percentile("slope", F.lit(0.5)).alias("slope"),
    ).crossJoin(F.broadcast(n_days))
    resid = daily.crossJoin(F.broadcast(est)).agg(
        F.round(
            F.percentile(
                F.col("y")
                - F.col("slope")
                * F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")),
                F.lit(0.5),
            ),
            6,
        ).alias("intercept")
    )
    return (
        est.crossJoin(F.broadcast(resid))
        .select(
            "n_days",
            "n_pairs",
            F.round("slope", 6).alias("slope_per_day"),
            "intercept",
        )
    )
