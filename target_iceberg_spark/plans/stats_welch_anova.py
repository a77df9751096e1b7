"""Welch's heteroscedastic one-way ANOVA (SURVEY.md §2B stats tier,
round 10).

agg_anova_f assumes equal group variances; agg_levene_bf tests that
assumption. When Levene rejects, the correct omnibus test is Welch's
ANOVA (Welch, Biometrika 1951, public) — weights w_j = n_j/s_j^2, a
weighted grand mean, and the Welch-Satterthwaite denominator — the
k-group generalization of the Welch t-test already in the tier. The
whole statistic is closed-form algebra on per-group sufficient
statistics, so the plan is one combinable groupBy plus arithmetic on
a k-row table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "agg_welch_anova",
    oracle="""
WITH grp AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_j,
           AVG(value) AS m_j,
           VAR_SAMP(value) AS s2_j
    FROM events GROUP BY event_type
),
w AS (
    SELECT event_type, n_j, m_j, s2_j, n_j / s2_j AS w_j FROM grp
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           SUM(w_j) AS sw,
           SUM(w_j * m_j) / SUM(w_j) AS mw
    FROM w
),
parts AS (
    SELECT t.k, t.sw, t.mw,
           SUM(w.w_j * (w.m_j - t.mw) * (w.m_j - t.mw)) / (t.k - 1) AS num,
           SUM(POW(1 - w.w_j / t.sw, 2) / (w.n_j - 1)) AS lam
    FROM w CROSS JOIN tot t
    GROUP BY t.k, t.sw, t.mw
)
SELECT ROUND(num / (1 + 2.0 * (k - 2) / (k * k - 1) * lam), 6) AS f_welch,
       CAST(k - 1 AS BIGINT) AS dof1,
       ROUND((k * k - 1) / (3.0 * lam), 2) AS dof2
FROM parts
""",
    tags=("stats", "experimentation", "anova"),
)
def agg_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's F over the per-event-type value groups: precision
    weights n_j/s_j^2, weighted between-group mean square in the
    numerator, the Satterthwaite lambda correction in the denominator,
    plus the fractional second degrees of freedom (k^2-1)/(3 lambda).

    Scale shape: ONE combinable moment pass (count/avg/var per
    group), then pure algebra on the k-row table with the 1-row
    weighted totals crossed back — the same sufficient-statistic
    discipline as agg_levene_bf, zero second passes over the data."""
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.avg("value").alias("m_j"),
        F.var_samp("value").alias("s2_j"),
    )
    w = grp.select("*", (F.col("n_j") / F.col("s2_j")).alias("w_j"))
    tot = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("w_j").alias("sw"),
        (F.sum(F.col("w_j") * F.col("m_j")) / F.sum("w_j")).alias("mw"),
    )
    parts = (
        w.crossJoin(F.broadcast(tot))
        .groupBy("k", "sw", "mw")
        .agg(
            (
                F.sum(
                    F.col("w_j") * (F.col("m_j") - F.col("mw")) * (F.col("m_j") - F.col("mw"))
                )
                / (F.col("k") - 1)
            ).alias("num"),
            F.sum(
                F.pow(1 - F.col("w_j") / F.col("sw"), F.lit(2)) / (F.col("n_j") - 1)
            ).alias("lam"),
        )
    )
    return parts.select(
        F.round(
            F.col("num")
            / (1 + 2.0 * (F.col("k") - 2) / (F.col("k") * F.col("k") - 1) * F.col("lam")),
            6,
        ).alias("f_welch"),
        (F.col("k") - 1).cast("bigint").alias("dof1"),
        F.round((F.col("k") * F.col("k") - 1) / (3.0 * F.col("lam")), 2).alias("dof2"),
    )
