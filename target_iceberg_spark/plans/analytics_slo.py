"""Multi-window SLO burn-rate alerting (SURVEY.md §2B event-time
family, round 7, post-window).

The Google SRE workbook's alerting recipe (ch. 5, public): page when
the error-budget burn rate exceeds a threshold in BOTH a long window
(catches slow burns, suppresses blips) and a short window (stops
alerting as soon as the problem ends). Computed here in batch over
the events stream — the query an SRE runs to BACKTEST a burn-rate
policy against history before wiring it into the pager.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SLO_TARGET = 0.78  # availability objective (error budget = 22%;
# the synthetic stream runs ~20% errors, so the policy actually fires)
SLO_LONG_H = 24  # long window, hours
SLO_SHORT_H = 2  # short window, hours
SLO_BURN = 1.1  # page when burn rate exceeds this in BOTH windows


@register(
    "events_slo_burn",
    oracle=f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS errs
    FROM events
    GROUP BY 1
),
rates AS (
    SELECT h,
           SUM(errs) OVER wl / CAST(SUM(n) OVER wl AS DOUBLE)
               / (1 - {SLO_TARGET}) AS burn_long,
           SUM(errs) OVER ws / CAST(SUM(n) OVER ws AS DOUBLE)
               / (1 - {SLO_TARGET}) AS burn_short
    FROM hourly
    WINDOW wl AS (ORDER BY h RANGE BETWEEN INTERVAL {SLO_LONG_H - 1} HOUR
                  PRECEDING AND CURRENT ROW),
           ws AS (ORDER BY h RANGE BETWEEN INTERVAL {SLO_SHORT_H - 1} HOUR
                  PRECEDING AND CURRENT ROW)
)
SELECT h, ROUND(burn_long, 4) AS burn_long,
       ROUND(burn_short, 4) AS burn_short
FROM rates
WHERE burn_long > {SLO_BURN} AND burn_short > {SLO_BURN}
ORDER BY h
""",
    tags=("events", "slo", "alerting"),
)
def events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the SRE multi-window burn-rate page: hourly error
    share over the {SLO_TARGET:.0%} objective's budget, and the hours
    where the burn rate exceeds {SLO_BURN}× in BOTH the
    {SLO_LONG_H}h (slow-burn detector) and {SLO_SHORT_H}h
    (fast-reset) trailing windows — the pages this policy would have
    fired on history.

    Scale shape: ONE combinable hourly pre-aggregation is the only
    event-volume stage; both burn windows run over the
    calendar-bounded hourly series (≤ hours-of-history rows — the
    aggregate-bounded window class, same as events_acf/agg_mom_growth)
    sharing one ordering. Range frames key on the hour timestamp with
    closed INTERVAL bounds, identical in both engines under the
    shared UTC-naive convention."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("errs"),
    )
    hourly = hourly.withColumn("hs", F.unix_micros("h"))
    budget = 1.0 - SLO_TARGET
    wl = Window.orderBy("hs").rangeBetween(
        -(SLO_LONG_H - 1) * 3600 * 1_000_000, 0
    )
    ws = Window.orderBy("hs").rangeBetween(
        -(SLO_SHORT_H - 1) * 3600 * 1_000_000, 0
    )
    rates = hourly.select(
        "h",
        (
            F.sum("errs").over(wl) / F.sum("n").over(wl).cast("double") / budget
        ).alias("_bl"),
        (
            F.sum("errs").over(ws) / F.sum("n").over(ws).cast("double") / budget
        ).alias("_bs"),
    )
    return (
        rates.where((F.col("_bl") > SLO_BURN) & (F.col("_bs") > SLO_BURN))
        .select(
            "h",
            F.round("_bl", 4).alias("burn_long"),
            F.round("_bs", 4).alias("burn_short"),
        )
        .orderBy("h")
    )
