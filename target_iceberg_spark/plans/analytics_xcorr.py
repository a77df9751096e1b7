"""Lead-lag cross-correlation between two event streams (SURVEY.md
§2B events tier, round 9).

"Do clicks LEAD purchases, and by how many hours?" is the classic
lead-lag question (Box & Jenkins time-series cross-correlation
function, public). The CCF at lag L is the Pearson correlation of
x(t) with y(t+L) over an ALIGNED, gap-filled grid — skipping empty
hours silently deletes zeros and biases r upward, so the grid is
materialized from the global time span, not from the data rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

XCORR_X = "click"  # leading candidate
XCORR_Y = "purchase"  # lagging candidate
XCORR_MAX_LAG = 3  # hours, both directions
_US_PER_HOUR = 3_600_000_000


@register(
    "events_xcorr",
    oracle=f"""
WITH h AS (
    SELECT epoch_us(ts) // {_US_PER_HOUR} AS hr, event_type FROM events
    WHERE event_type IN ('{XCORR_X}', '{XCORR_Y}')
),
span AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM h),
grid AS (
    SELECT unnest(range(lo, hi + 1)) AS hr FROM span
),
cx AS (
    SELECT hr, COUNT(*) AS c FROM h WHERE event_type = '{XCORR_X}'
    GROUP BY hr
),
cy AS (
    SELECT hr, COUNT(*) AS c FROM h WHERE event_type = '{XCORR_Y}'
    GROUP BY hr
),
series AS (
    SELECT g.hr,
           CAST(COALESCE(cx.c, 0) AS DOUBLE) AS x,
           CAST(COALESCE(cy.c, 0) AS DOUBLE) AS y
    FROM grid g
    LEFT JOIN cx ON g.hr = cx.hr
    LEFT JOIN cy ON g.hr = cy.hr
),
lags AS (
    SELECT unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG} + 1)) AS lag
),
pairs AS (
    SELECT l.lag, a.x, b.y
    FROM lags l
    JOIN series a ON TRUE
    JOIN series b ON b.hr = a.hr + l.lag
)
SELECT CAST(lag AS BIGINT) AS lag_hours,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(CORR(x, y), 6) AS r
FROM pairs
GROUP BY lag
ORDER BY lag
""",
    tags=("events", "timeseries", "correlation"),
)
def events_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between hourly {XCORR_X} and
    {XCORR_Y} counts at lags -{XCORR_MAX_LAG}..+{XCORR_MAX_LAG} hours:
    positive-lag r is corr(x(t), y(t+lag)), so the argmax lag reads
    directly as "x leads y by that many hours".

    Scale shape: events collapse to per-hour counts in one combinable
    groupBy (the only event-volume stage); the hour grid comes from a
    sequence() over the global [min, max] span (rows = span hours, a
    property of the calendar, not the corpus); the lag fan-out is a
    7-element literal explode; and each lag's Pearson r is a
    combinable CORR over grid-sized input. Shuffle keys are hour ids
    — bounded, uniform, skew-free."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(XCORR_X, XCORR_Y)
    )
    # `div` is exact integer division — a double quotient could round
    # an x.9999 hour boundary up and disagree with DuckDB's `//`
    h = ev.select(
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {_US_PER_HOUR}"
        ).alias("hr"),
        "event_type",
    )
    span = h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = span.select(
        F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    cx = (
        h.where(F.col("event_type") == XCORR_X)
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("cxn"))
    )
    cy = (
        h.where(F.col("event_type") == XCORR_Y)
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("cyn"))
    )
    series = (
        grid.join(cx, "hr", "left")
        .join(cy, "hr", "left")
        .select(
            "hr",
            F.coalesce("cxn", F.lit(0)).cast("double").alias("x"),
            F.coalesce("cyn", F.lit(0)).cast("double").alias("y"),
        )
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    a = series.alias("a")
    b = series.select(
        F.col("hr").alias("bhr"), F.col("y").alias("by")
    ).alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("bhr") == F.col("a.hr") + F.col("lag"))
        .select("lag", F.col("a.x").alias("x"), F.col("by").alias("y"))
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.round(F.corr("x", "y"), 6).alias("r"),
        )
        .select(F.col("lag").cast("bigint").alias("lag_hours"), "n_hours", "r")
        .orderBy("lag_hours")
    )
