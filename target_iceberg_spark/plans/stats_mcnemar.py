"""McNemar's test for paired binary outcomes (SURVEY.md §2B stats
tier, round 9).

The within-subject counterpart of the two-proportion z-test: when the
SAME user yields two binary outcomes (here: heavy clicker vs heavy
purchaser), the information about marginal difference lives entirely
in the DISCORDANT pairs, and McNemar (Psychometrika 1947, public)
tests b vs c with the continuity-corrected (|b-c|-1)^2/(b+c) ~ chi2(1).
Model-eval pipelines use exactly this to compare two classifiers on a
shared eval set, so the engine carries it as a first-class aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

MCN_CLICKS = 14  # outcome A: user has >= this many clicks
MCN_PURCHASES = 14  # outcome B: user has >= this many purchases
MCN_CHI2_CRIT = 3.841458820694124  # chi2(1) upper 5% point


@register(
    "agg_mcnemar",
    oracle=f"""
WITH u AS (
    SELECT user_id,
           CASE WHEN COUNT(*) FILTER (WHERE event_type = 'click')
                     >= {MCN_CLICKS} THEN 1 ELSE 0 END AS a,
           CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase')
                     >= {MCN_PURCHASES} THEN 1 ELSE 0 END AS b
    FROM events GROUP BY user_id
),
cells AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(a * b) AS BIGINT) AS n_both,
           CAST(SUM(a * (1 - b)) AS BIGINT) AS n_a_only,
           CAST(SUM((1 - a) * b) AS BIGINT) AS n_b_only,
           CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n_neither
    FROM u
)
SELECT n_users, n_both, n_a_only, n_b_only, n_neither,
       ROUND(POW(ABS(n_a_only - n_b_only) - 1, 2)
             / (n_a_only + n_b_only), 6) AS chi2_cc,
       POW(ABS(n_a_only - n_b_only) - 1, 2)
           / (n_a_only + n_b_only) > {MCN_CHI2_CRIT} AS reject_h0
FROM cells
""",
    tags=("stats", "experimentation", "paired"),
)
def agg_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar 2x2 over paired per-user flags (heavy clicker >=
    {MCN_CLICKS} clicks vs heavy purchaser >= {MCN_PURCHASES}
    purchases): the four concordance cells, the continuity-corrected
    statistic (|b-c|-1)^2/(b+c), and the 5% decision.

    Scale shape: one combinable per-user groupBy (conditional counts)
    followed by one global fold of four integer sums — the discordant
    cells are sufficient statistics, so nothing beyond five integers
    ever reaches the driver side of the plan."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            >= MCN_CLICKS
        )
        .cast("int")
        .alias("a"),
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            >= MCN_PURCHASES
        )
        .cast("int")
        .alias("b"),
    )
    cells = u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n_both"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n_a_only"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n_b_only"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("bigint")
        .alias("n_neither"),
    )
    stat = F.pow(
        F.abs(F.col("n_a_only") - F.col("n_b_only")) - 1, 2
    ) / (F.col("n_a_only") + F.col("n_b_only"))
    return cells.select(
        "n_users",
        "n_both",
        "n_a_only",
        "n_b_only",
        "n_neither",
        F.round(stat, 6).alias("chi2_cc"),
        (stat > MCN_CHI2_CRIT).alias("reject_h0"),
    )
