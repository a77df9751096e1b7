"""Seasonal-strength decomposition of event load (SURVEY.md §2B
events tier, round 9).

"How much of our traffic variance is just the daily rhythm?" is the
first question capacity planning and anomaly thresholding ask of a
series. The classic answer (Wang, Smith & Hyndman 2006; the STL
`seasonal strength` feature, public) is 1 - Var(remainder)/Var(total)
after removing the seasonal profile — here the hour-of-day mean. A
strength near 1 says alert thresholds must be hour-conditional; near
0 says a flat threshold is fine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

_US_PER_HOUR = 3_600_000_000


@register(
    "events_seasonal_strength",
    oracle=f"""
WITH h AS (
    SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS hr FROM events
),
span AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM h),
grid AS (
    SELECT e.event_type, g.hr
    FROM (SELECT DISTINCT event_type FROM h) e,
         (SELECT unnest(range(lo, hi + 1)) AS hr FROM span) g
),
counts AS (
    SELECT event_type, hr, COUNT(*) AS c FROM h GROUP BY 1, 2
),
series AS (
    SELECT g.event_type, g.hr, g.hr % 24 AS hod,
           CAST(COALESCE(c.c, 0) AS DOUBLE) AS y
    FROM grid g
    LEFT JOIN counts c ON g.event_type = c.event_type AND g.hr = c.hr
),
prof AS (
    SELECT event_type, hod, AVG(y) AS m
    FROM series GROUP BY 1, 2
),
resid AS (
    SELECT s.event_type, s.y, s.y - p.m AS r
    FROM series s JOIN prof p
      ON s.event_type = p.event_type AND s.hod = p.hod
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(VAR_SAMP(y), 6) AS var_total,
       ROUND(VAR_SAMP(r), 6) AS var_residual,
       ROUND(GREATEST(0, 1 - VAR_SAMP(r) / VAR_SAMP(y)), 6)
           AS seasonal_strength
FROM resid
GROUP BY event_type
ORDER BY event_type
""",
    tags=("events", "timeseries", "seasonality"),
)
def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal strength per event type: gap-filled hourly
    counts, the 24-slot hour-of-day mean profile, and
    1 - Var(residual)/Var(total) clamped at 0 — the STL-style
    strength-of-seasonality feature.

    Scale shape: events collapse to (type, hour) counts in one
    combinable groupBy; the grid is |types| x calendar hours (a
    property of the time span); the profile is a 24 x |types|
    aggregate broadcast back onto the grid; both variances are
    combinable VAR_SAMPs over grid-sized input. Nothing scales with
    raw event volume past the first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_HOUR}").alias(
            "hr"
        ),
    )
    span = h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    types = h.select("event_type").distinct()
    grid = types.crossJoin(
        F.broadcast(span).select(F.explode(F.sequence("lo", "hi")).alias("hr"))
    )
    counts = h.groupBy("event_type", "hr").agg(F.count(F.lit(1)).alias("c"))
    series = (
        grid.join(counts, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            (F.col("hr") % 24).alias("hod"),
            F.coalesce("c", F.lit(0)).cast("double").alias("y"),
        )
    )
    prof = series.groupBy("event_type", "hod").agg(F.avg("y").alias("m"))
    resid = series.join(F.broadcast(prof), ["event_type", "hod"]).select(
        "event_type", "y", (F.col("y") - F.col("m")).alias("r")
    )
    return (
        resid.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.round(F.var_samp("y"), 6).alias("var_total"),
            F.round(F.var_samp("r"), 6).alias("var_residual"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - F.var_samp("r") / F.var_samp("y"),
                ),
                6,
            ).alias("seasonal_strength"),
        )
        .orderBy("event_type")
    )
