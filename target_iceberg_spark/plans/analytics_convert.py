"""Conversion latency and heavy-tail fitting (SURVEY.md §2B event
analytics / stats tiers, round 7, post-window).

  * events_time_to_convert — signup→first-purchase latency per weekly
    signup cohort: THE activation metric a growth team tracks, and
    the non-trivial half of funnel analysis (events_funnel counts
    stage survivors; this measures how long the stage takes).
  * agg_powerlaw_alpha — continuous-approximation MLE of the
    power-law exponent over per-user activity (Clauset, Shalizi &
    Newman, SIAM Rev. 2009, eq. 3.7 with the xmin-½ discrete
    correction): the one-number answer to "how heavy is the user
    activity tail", which sizes everything from skew-join salting to
    top-k capacity sketches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PL_XMIN = 20  # tail threshold: users with >= this many events


@register(
    "events_time_to_convert",
    oracle="""
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
    FROM events
    GROUP BY user_id
),
conv AS (
    SELECT date_trunc('week', signup_ts) AS cohort_week,
           CASE WHEN first_buy >= signup_ts THEN
               (epoch_us(first_buy) - epoch_us(signup_ts)) / 3600e6 END
               AS hours
    FROM firsts
    WHERE signup_ts IS NOT NULL
)
SELECT CAST(cohort_week AS DATE) AS cohort_week,
       CAST(COUNT(*) AS BIGINT) AS n_signups,
       CAST(COUNT(hours) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(hours, 0.5), 2) AS median_hours,
       ROUND(quantile_cont(hours, 0.9), 2) AS p90_hours
FROM conv
GROUP BY cohort_week
ORDER BY cohort_week
""",
    tags=("events", "funnel", "conversion"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase latency per weekly signup cohort: users
    whose first purchase lands at-or-after their first signup count
    as converted, with exact median and p90 hours-to-convert (Spark's
    percentile() and DuckDB's quantile_cont share the interpolation
    rule — the agg_percentile idiom). Users purchasing only BEFORE
    their signup stay unconverted rather than producing negative
    latencies.

    Scale shape: ONE combinable per-user conditional-MIN groupBy is
    the only event-volume stage; everything after runs on one row per
    signed-up user, grouped into calendar-week cohorts (weeks ×
    percentiles, a bounded exact-percentile group). The µs→hours
    division is exact integer-to-double arithmetic, rounded."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", ts)).alias("signup_ts"),
        F.min(F.when(F.col("event_type") == "purchase", ts)).alias("first_buy"),
    )
    conv = firsts.where(F.col("signup_ts").isNotNull()).select(
        F.date_trunc("week", "signup_ts").alias("cohort_week"),
        F.when(
            F.col("first_buy") >= F.col("signup_ts"),
            (
                F.unix_micros(F.col("first_buy"))
                - F.unix_micros(F.col("signup_ts"))
            )
            / 3600e6,
        ).alias("hours"),
    )
    return (
        conv.groupBy(F.col("cohort_week").cast("date").alias("cohort_week"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.count("hours").alias("n_converted"),
            F.round(F.expr("percentile(hours, 0.5)"), 2).alias("median_hours"),
            F.round(F.expr("percentile(hours, 0.9)"), 2).alias("p90_hours"),
        )
        .orderBy("cohort_week")
    )


@register(
    "agg_powerlaw_alpha",
    oracle=f"""
WITH activity AS (
    SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS x
    FROM events GROUP BY user_id
),
tail AS (SELECT x FROM activity WHERE x >= {PL_XMIN})
SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
       CAST({PL_XMIN} AS BIGINT) AS xmin,
       ROUND(1.0 + COUNT(*) / SUM(ln(x / ({PL_XMIN} - 0.5))), 4) AS alpha,
       ROUND(AVG(x), 2) AS mean_tail
FROM tail
""",
    tags=("stats", "powerlaw", "skew"),
)
def agg_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent of the per-user activity tail by the
    continuous-approximation MLE α = 1 + n / Σ ln(xᵢ/(xmin-½))
    (Clauset–Shalizi–Newman 2009, eq. 3.7 — the ½ shift is the
    standard discrete correction). α near 2 = extreme concentration
    (expect hot keys; salt joins), α > 3 = light tail (uniform
    partitioning is fine) — the number that justifies the engine's
    skew machinery (join_salted, agg_salted, AQE skew splits).

    Scale shape: one combinable per-user count, a pushed tail filter,
    and a single closed-form aggregate (count + Σln) — two passes of
    map-side-combinable work, no windows, no joins."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    tail = activity.where(F.col("x") >= PL_XMIN)
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.lit(PL_XMIN).cast("long").alias("xmin"),
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1)) / F.sum(F.log(F.col("x") / (PL_XMIN - 0.5))),
            4,
        ).alias("alpha"),
        F.round(F.avg("x"), 2).alias("mean_tail"),
    )
