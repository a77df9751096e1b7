"""Experiment-health guardrails: sample-ratio mismatch and
capture-recapture coverage (SURVEY.md §2B events tier, round 9).

events_srm — the first thing any experimentation platform checks
before reading a metric: does the realized arm split match the
designed 50/50? A daily chi-square on distinct-user counts catches
broken bucketing, bot floods, and logging loss (Fabijan et al.
"Diagnosing sample ratio mismatch", KDD'19 — public). A metric read
on an SRM day is invalid no matter how significant it looks.

events_capture_recapture — Lincoln-Petersen/Chapman estimation of
population size from two overlapping observation windows (Chapman
1951, public): the standard audit for "how many users do we actually
have vs how many we log", and — on data pipelines — for estimating
total duplicate mass from two dedup samples. The synthetic corpus
logs everyone, so the estimate is checked against the TRUE distinct
count it should recover.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SRM_CHI2_CRIT = 3.841458820694124  # chi2(1) at 5%
CR_SPLIT = "2024-01-16"  # capture window boundary


@register(
    "events_srm",
    oracle=f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 1
                                    THEN user_id END) AS BIGINT) AS n_treat,
           CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0
                                    THEN user_id END) AS BIGINT) AS n_control
    FROM events GROUP BY 1
)
SELECT day, n_treat, n_control,
       ROUND(POW(n_treat - n_control, 2)
             / CAST(n_treat + n_control AS DOUBLE), 6) AS chi2,
       POW(n_treat - n_control, 2)
           / CAST(n_treat + n_control AS DOUBLE) > {SRM_CHI2_CRIT}
           AS srm_flag
FROM daily
ORDER BY day
""",
    tags=("events", "experimentation", "guardrail"),
)
def events_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily sample-ratio-mismatch check on the odd/even user split:
    distinct users per arm per day, the equal-split chi-square
    (nt - nc)^2 / (nt + nc), and the 5% flag.

    Scale shape: one combinable groupBy per day with two conditional
    COUNT DISTINCTs (Spark expands to a partial-aggregated
    distinct-expand, still two-phase); everything after operates on
    one row per calendar day. Day keys are uniform — no skew."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct(
            F.when(F.col("user_id") % 2 == 1, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_treat"),
        F.countDistinct(
            F.when(F.col("user_id") % 2 == 0, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_control"),
    )
    chi2 = F.pow(F.col("n_treat") - F.col("n_control"), 2) / (
        F.col("n_treat") + F.col("n_control")
    ).cast("double")
    return daily.select(
        "day",
        "n_treat",
        "n_control",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > SRM_CHI2_CRIT).alias("srm_flag"),
    ).orderBy("day")


@register(
    "events_capture_recapture",
    oracle=f"""
WITH a AS (
    SELECT DISTINCT user_id FROM events
    WHERE ts < TIMESTAMP '{CR_SPLIT}'
),
b AS (
    SELECT DISTINCT user_id FROM events
    WHERE ts >= TIMESTAMP '{CR_SPLIT}'
),
counts AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM a JOIN b USING (user_id)) AS m_overlap,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM events) AS true_distinct
)
SELECT n_a, n_b, m_overlap, true_distinct,
       ROUND((n_a + 1.0) * (n_b + 1.0) / (m_overlap + 1.0) - 1.0, 4)
           AS chapman_estimate,
       ROUND(ABS((n_a + 1.0) * (n_b + 1.0) / (m_overlap + 1.0) - 1.0
                 - true_distinct) / true_distinct, 6) AS rel_error
FROM counts
""",
    tags=("events", "estimation", "profiling"),
)
def events_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture: users seen before {CR_SPLIT} are the
    first capture, users on/after it the second; the bias-corrected
    estimate (nA+1)(nB+1)/(m+1) - 1 should recover the true distinct
    user count, and the output carries both so the driver hash checks
    the estimator AND its ground truth.

    Scale shape: one pass computes per-user min/max-side presence
    flags (a combinable groupBy on user_id); nA, nB, m, and the true
    count then fold from boolean sums in one reduce. The pedagogical
    two-set join in the oracle is expressed in Spark as flags on the
    single user frame — no join at all."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(CR_SPLIT).cast("timestamp_ntz")
    u = ev.groupBy("user_id").agg(
        F.max((F.col("ts") < split).cast("int")).alias("in_a"),
        F.max((F.col("ts") >= split).cast("int")).alias("in_b"),
    )
    counts = u.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum("in_b").cast("bigint").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("m_overlap"),
        F.count(F.lit(1)).cast("bigint").alias("true_distinct"),
    )
    est = (F.col("n_a") + 1.0) * (F.col("n_b") + 1.0) / (
        F.col("m_overlap") + 1.0
    ) - 1.0
    return counts.select(
        "n_a",
        "n_b",
        "m_overlap",
        "true_distinct",
        F.round(est, 4).alias("chapman_estimate"),
        F.round(
            F.abs(est - F.col("true_distinct")) / F.col("true_distinct"), 6
        ).alias("rel_error"),
    )
