"""Ratio-metric experimentation tier (SURVEY.md §2B stats, round 8).

Two workhorses every A/B platform ships next to the t-test tier
(agg_ab_test / agg_cuped / agg_decile_lift):

  * agg_ratio_delta — the DELTA METHOD for ratio metrics (Deng,
    Knoblich & Lu, KDD'18, public): "value per event" is a ratio of
    two USER-level sums, so the naive per-event variance is wrong
    (events within a user correlate); the delta method propagates the
    user-level (Y, N) covariance matrix through the ratio.
  * agg_power_mde — the pre-experiment sample-size calculation:
    n per arm to detect a relative lift at 80% power / 5% alpha from
    the observed metric variance (standard two-sample normal
    approximation; z constants are literals on both sides).

Both are pure combinable-moment queries: sums, squares, and cross
products aggregate map-side; the final arithmetic runs on one row per
arm/type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

Z_ALPHA = 1.959964  # two-sided 5%
Z_BETA = 0.841621  # 80% power
MDE_REL = 0.02  # detect a 2% relative lift


@register(
    "agg_ratio_delta",
    oracle="""
WITH per_user AS (
    SELECT user_id, user_id % 2 AS arm,
           SUM(value) AS y,
           CAST(COUNT(*) AS DOUBLE) AS n
    FROM events GROUP BY user_id
),
mom AS (
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           AVG(y) AS my, AVG(n) AS mn,
           var_samp(y) AS vy, var_samp(n) AS vn,
           covar_samp(y, n) AS cyn
    FROM per_user GROUP BY arm
)
SELECT arm, n_users,
       ROUND(my / mn, 6) AS ratio,
       ROUND(sqrt((vy - 2 * (my / mn) * cyn
                   + (my / mn) * (my / mn) * vn)
                  / (mn * mn) / n_users), 6) AS se_delta,
       ROUND(my / mn - 1.959964 * sqrt((vy - 2 * (my / mn) * cyn
                   + (my / mn) * (my / mn) * vn)
                  / (mn * mn) / n_users), 6) AS ci_lo,
       ROUND(my / mn + 1.959964 * sqrt((vy - 2 * (my / mn) * cyn
                   + (my / mn) * (my / mn) * vn)
                  / (mn * mn) / n_users), 6) AS ci_hi
FROM mom
ORDER BY arm
""",
    tags=("stats", "experimentation", "ratio", "delta-method"),
)
def agg_ratio_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for the ratio metric value-per-event, by arm
    (user_id parity — the same deterministic split the t-test tier
    uses): R = mean(Y_u)/mean(N_u) over users, and
    Var(R) ~ (V[Y] - 2R·Cov[Y,N] + R²·V[N]) / (mean(N)²·n). Treating
    events as independent would understate the variance whenever
    users contribute correlated event counts and values — the classic
    ratio-metric trap the delta method (Deng et al. KDD'18) fixes.

    Scale shape: per-user sums are one combinable groupBy; the
    moment table is one tiny grouped aggregate per arm; all the
    ratio algebra runs on 2 rows."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum("value").alias("y"),
        F.count(F.lit(1)).cast("double").alias("n"),
    ).select((F.col("user_id") % 2).alias("arm"), "y", "n")
    mom = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("y").alias("my"),
        F.avg("n").alias("mn"),
        F.var_samp("y").alias("vy"),
        F.var_samp("n").alias("vn"),
        F.covar_samp("y", "n").alias("cyn"),
    )
    r = F.col("my") / F.col("mn")
    var = (
        (F.col("vy") - 2 * r * F.col("cyn") + r * r * F.col("vn"))
        / (F.col("mn") * F.col("mn"))
        / F.col("n_users")
    )
    se = F.sqrt(var)
    return mom.select(
        "arm",
        "n_users",
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se_delta"),
        F.round(r - Z_ALPHA * se, 6).alias("ci_lo"),
        F.round(r + Z_ALPHA * se, 6).alias("ci_hi"),
    ).orderBy("arm")


@register(
    "agg_power_mde",
    oracle=f"""
WITH per_user AS (
    SELECT user_id, event_type, SUM(value) AS y
    FROM events GROUP BY user_id, event_type
),
mom AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           AVG(y) AS mu, var_samp(y) AS v
    FROM per_user GROUP BY event_type
)
SELECT event_type, n_users,
       ROUND(mu, 4) AS mean_y,
       ROUND(sqrt(v), 4) AS sd_y,
       ROUND(mu * {MDE_REL}, 6) AS mde_abs,
       CAST(ceil(2 * power({Z_ALPHA} + {Z_BETA}, 2) * v
                 / power(mu * {MDE_REL}, 2)) AS BIGINT) AS n_per_arm
FROM mom
ORDER BY event_type
""",
    tags=("stats", "experimentation", "power"),
)
def agg_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment sample sizing from observed moments: for each
    event type's per-user value metric, the users PER ARM needed to
    detect a {MDE_REL:.0%} relative lift at 80% power and two-sided
    5% alpha — n = 2(z_a+z_b)²σ²/δ² (the standard two-sample normal
    approximation; both z constants are plan literals, identical in
    the oracle). The experimentation tier's missing first step:
    CUPED and the t-test say what HAPPENED; this says how long to
    run.

    Scale shape: one combinable per-(user, type) sum, one tiny
    moment aggregate per type, scalar arithmetic on k rows."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.sum("value").alias("y")
    )
    mom = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("y").alias("mu"),
        F.var_samp("y").alias("v"),
    )
    delta = F.col("mu") * MDE_REL
    return mom.select(
        "event_type",
        "n_users",
        F.round("mu", 4).alias("mean_y"),
        F.round(F.sqrt("v"), 4).alias("sd_y"),
        F.round(delta, 6).alias("mde_abs"),
        F.ceil(
            2 * (Z_ALPHA + Z_BETA) ** 2 * F.col("v") / (delta * delta)
        )
        .cast("bigint")
        .alias("n_per_arm"),
    ).orderBy("event_type")
