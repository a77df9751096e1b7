"""Experimentation / model-evaluation statistics (SURVEY.md §2B
stats tier, round 7): CUPED variance reduction, decile lift, and
Cramér's V association.

The reference (SidetrekAI/target-iceberg, ingestion-only) has no
query surface; these extend the engine's A/B-testing tier
(plans/stats_inference.py: Welch t, chi², Mann-Whitney, bootstrap)
with the three next questions an experimentation platform asks:

  * agg_cuped      — CUPED-adjusted arm means (Deng, Xu, Kohavi &
                     Walker, WSDM 2013): regress the experiment metric
                     on a pre-period covariate and report the variance
                     reduction the adjustment buys.
  * agg_decile_lift — conversion lift by score decile: rank users by
                     an early-activity score, bucket into deciles, and
                     compare each decile's later conversion to base
                     rate — the standard model-quality table.
  * agg_cramers_v  — Cramér's V association between two categoricals
                     (event type × day-of-week index), the effect-size
                     companion to agg_chi_square.

All three are pure multi-level aggregations — every full-data stage
is combinable (map-side partial aggregation), the only shuffles are
on low-cardinality keys (arm, decile, type×dow cell), and no window
spans more than one user's history — so each survives a 1000-executor
100 TB run unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# experiment split: first half of the observation window is the
# pre-period (covariate), second half the experiment period
CUPED_SPLIT = "2024-01-16 00:00:00"


@register(
    "agg_cuped",
    oracle=f"""
WITH per_user AS (
    SELECT user_id, user_id % 2 AS arm,
           SUM(CASE WHEN ts <  TIMESTAMP '{CUPED_SPLIT}' THEN value ELSE 0 END) AS x,
           SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}' THEN value ELSE 0 END) AS y
    FROM events
    GROUP BY user_id
),
fit AS (
    SELECT COVAR_POP(x, y) / VAR_POP(x) AS theta, AVG(x) AS mean_x
    FROM per_user
),
adjusted AS (
    SELECT p.arm, p.y, p.y - f.theta * (p.x - f.mean_x) AS y_adj, f.theta
    FROM per_user p, fit f
),
arms AS (
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           AVG(y) AS mean_y, AVG(y_adj) AS mean_y_cuped,
           VAR_SAMP(y) AS var_y, VAR_SAMP(y_adj) AS var_y_cuped,
           MIN(theta) AS theta
    FROM adjusted
    GROUP BY arm
)
SELECT CAST(arm AS BIGINT) AS arm, n_users,
       ROUND(mean_y, 4) AS mean_y,
       ROUND(mean_y_cuped, 4) AS mean_y_cuped,
       ROUND(theta, 4) AS theta,
       ROUND(1.0 - var_y_cuped / var_y, 4) AS var_reduction
FROM arms
ORDER BY arm
""",
    tags=("stats", "experimentation", "cuped"),
)
def agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng–Xu–Kohavi–Walker, WSDM 2013):
    per user, x = pre-period value sum and y = experiment-period value
    sum; theta = cov(x,y)/var(x) fitted on ALL users (the covariate
    predates assignment, so pooling is unbiased); the adjusted metric
    y' = y - theta*(x - mean(x)) keeps each arm's mean estimate
    unbiased while shrinking its variance by the squared x-y
    correlation. Reports per-arm raw vs adjusted means and the
    realized variance reduction — the number that says how much
    smaller the experiment could have been.

    Scale shape: one combinable per-user conditional-sum groupBy (the
    only full-data shuffle, on user_id), a 1-row theta fit broadcast
    back by Spark's scalar-subquery machinery (crossJoin of one row),
    and a 2-group rollup. No windows, no per-row Python."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)).alias("y"),
    )
    fit = per_user.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("theta"),
        F.avg("x").alias("mean_x"),
    )
    adjusted = per_user.crossJoin(F.broadcast(fit)).select(
        "arm",
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("mean_x"))).alias("y_adj"),
        "theta",
    )
    arms = adjusted.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("y").alias("_mean_y"),
        F.avg("y_adj").alias("_mean_y_adj"),
        F.var_samp("y").alias("_var_y"),
        F.var_samp("y_adj").alias("_var_y_adj"),
        F.min("theta").alias("_theta"),
    )
    return arms.select(
        F.col("arm").cast("long").alias("arm"),
        "n_users",
        F.round("_mean_y", 4).alias("mean_y"),
        F.round("_mean_y_adj", 4).alias("mean_y_cuped"),
        F.round("_theta", 4).alias("theta"),
        F.round(F.lit(1.0) - F.col("_var_y_adj") / F.col("_var_y"), 4).alias(
            "var_reduction"
        ),
    ).orderBy("arm")


@register(
    "agg_decile_lift",
    oracle=f"""
WITH per_user AS (
    SELECT user_id,
           SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}' THEN 1 ELSE 0 END)
               AS early_events,
           MAX(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                     AND event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
    FROM events
    GROUP BY user_id
),
ranked AS (
    SELECT converted,
           NTILE(10) OVER (ORDER BY early_events DESC, user_id) AS decile
    FROM per_user
),
base AS (SELECT AVG(CAST(converted AS DOUBLE)) AS base_rate FROM ranked)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       ROUND(AVG(CAST(converted AS DOUBLE)), 4) AS conv_rate,
       ROUND(AVG(CAST(converted AS DOUBLE)) / (SELECT base_rate FROM base), 4)
           AS lift
FROM ranked
GROUP BY decile
ORDER BY decile
""",
    tags=("stats", "experimentation", "lift"),
)
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table: score every user by pre-period activity
    (event count before the split), rank into NTILE(10) deciles
    (ties broken by user_id so the bucketing is engine-deterministic),
    and report each decile's later purchase-conversion rate against
    the base rate — the standard evaluation table for a propensity
    score, here demonstrating the plan shape with activity as the
    score.

    Scale shape: the oracle states the NTILE window; the Spark plan
    computes the SAME bucketing without any single-partition window —
    the distributed exact-rank recipe (zipWithIndex in DataFrame
    form): range-repartition the per-user rows on the rank order,
    row_number WITHIN each range partition (a partitioned window),
    add each partition's prefix count (an offset cumsum over
    <= #partitions rows), and derive the NTILE bucket from the exact
    global rank with integer arithmetic (the first n%10 buckets take
    ceil(n/10) rows — NTILE's documented fill rule). Every stage is
    either combinable, partitioned, or bounded by the partition
    count, so the exact decile table survives 10^8 users where a
    global NTILE window serializes."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("early_events"),
        F.max(
            F.when(
                (F.col("ts") >= split) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("converted"),
    )
    # pin the range partitioning: sizes and row_numbers must see the
    # SAME partition assignment (re-executed lineage may resample
    # range boundaries)
    parts = per_user.repartitionByRange(
        32, F.col("early_events").desc(), F.col("user_id")
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    local = parts.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(
                F.col("early_events").desc(), F.col("user_id")
            )
        ),
    )
    sizes = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = sizes.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    total = sizes.agg(F.sum("_cnt").alias("_n"))
    ranked = (
        local.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .select(
            "converted",
            (F.col("_rn") + F.col("_off")).alias("_rank"),
            "_n",
        )
    )
    # NTILE(10) from the exact rank: q = n div 10, r = n mod 10; the
    # first r buckets hold q+1 rows, the rest q. When n < 10, q = 0
    # and big = n, so every rank lands in the first branch (one row
    # per bucket — exactly NTILE); the otherwise-divisor is still
    # guarded with GREATEST(q, 1) so the never-taken branch cannot
    # divide by zero under ANSI or eager evaluation.
    q, r = (F.col("_n") / 10).cast("long"), F.col("_n") % 10
    big = (q + 1) * r  # rows living in the first r (larger) buckets
    decile = F.when(
        F.col("_rank") <= big,
        F.ceil(F.col("_rank") / (q + 1)),
    ).otherwise(r + F.ceil((F.col("_rank") - big) / F.greatest(q, F.lit(1))))
    ranked = ranked.select("converted", decile.alias("decile"))
    base = ranked.agg(F.avg(F.col("converted").cast("double")).alias("base_rate"))
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.avg(F.col("converted").cast("double")).alias("_rate"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_users",
            "n_converted",
            F.round("_rate", 4).alias("conv_rate"),
            F.round(F.col("_rate") / F.col("base_rate"), 4).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "agg_cramers_v",
    oracle="""
WITH cells AS (
    SELECT event_type,
           (epoch_us(ts) // 86400000000) % 7 AS dow,
           CAST(COUNT(*) AS BIGINT) AS o
    FROM events
    GROUP BY event_type, (epoch_us(ts) // 86400000000) % 7
),
margins AS (
    SELECT c.event_type, c.dow, c.o,
           SUM(c.o) OVER (PARTITION BY c.event_type) AS row_total,
           SUM(c.o) OVER (PARTITION BY c.dow) AS col_total,
           SUM(c.o) OVER () AS n
    FROM cells c
),
chi AS (
    SELECT SUM(POW(o - row_total * col_total / CAST(n AS DOUBLE), 2)
               / (row_total * col_total / CAST(n AS DOUBLE))) AS chi2,
           MIN(n) AS n,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
           CAST(COUNT(DISTINCT dow) AS BIGINT) AS c
    FROM margins
)
SELECT CAST(n AS BIGINT) AS n, ROUND(chi2, 4) AS chi2,
       CAST(LEAST(r - 1, c - 1) AS BIGINT) AS dof_min,
       ROUND(SQRT(chi2 / (n * LEAST(r - 1, c - 1))), 4) AS cramers_v
FROM chi
""",
    tags=("stats", "association", "chi-square"),
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1] effect-size companion to the chi-square
    test (agg_chi_square tells you the type×day association is
    significant; V tells you whether it is big): V = sqrt(chi² /
    (n·min(r-1, c-1))) over the event-type × day-index contingency
    table. The day index is epoch-days mod 7 (identical integer
    arithmetic in both engines — calendar DOW numbering differs
    between Spark and DuckDB, the documented seam).

    Scale shape: the full-data stage is ONE combinable count into
    r×c = 35 cells; margins are windows over those 35 rows (the
    aggregate-bounded window class the plan CI whitelists), and the
    final row is arithmetic. Nothing downstream of the first groupBy
    scales with the data."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / F.lit(86400000000)
                )
            )
            % 7
        ).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_total"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_total"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_total") * F.col("col_total") / F.col("n").cast("double")
    chi = margins.agg(
        F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
        F.min("n").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
    )
    dof = F.least(F.col("r") - 1, F.col("c") - 1)
    return chi.select(
        F.col("n").cast("long").alias("n"),
        F.round("chi2", 4).alias("chi2"),
        dof.cast("long").alias("dof_min"),
        F.round(F.sqrt(F.col("chi2") / (F.col("n") * dof)), 4).alias("cramers_v"),
    )


@register(
    "agg_paired_ttest",
    oracle=f"""
WITH per_user AS (
    SELECT user_id,
           SUM(CASE WHEN ts <  TIMESTAMP '{CUPED_SPLIT}' THEN value ELSE 0 END) AS x,
           SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}' THEN value ELSE 0 END) AS y
    FROM events
    GROUP BY user_id
),
d AS (SELECT y - x AS diff FROM per_user)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(diff), 4) AS mean_diff,
       ROUND(STDDEV_SAMP(diff), 4) AS sd_diff,
       ROUND(AVG(diff) / (STDDEV_SAMP(diff) / SQRT(COUNT(*))), 4) AS t_stat,
       ROUND(AVG(diff) / STDDEV_SAMP(diff), 4) AS cohens_dz
FROM d
""",
    tags=("stats", "experimentation", "ttest"),
)
def agg_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test on each user's pre- vs post-split value sums —
    the within-subject companion to agg_ab_test's between-arm Welch
    test (pairing removes the between-user variance, which is why
    pre/post product changes are evaluated this way), with Cohen's dz
    effect size alongside the t statistic.

    Scale shape: ONE combinable per-user conditional-sum groupBy, then
    a single global aggregate over the differences (count/mean/stddev
    are one combinable pass). No windows, no joins."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    d = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0))
            - F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0))
        ).alias("diff")
    )
    return d.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("diff"), 4).alias("mean_diff"),
        F.round(F.stddev_samp("diff"), 4).alias("sd_diff"),
        F.round(
            F.avg("diff")
            / (F.stddev_samp("diff") / F.sqrt(F.count(F.lit(1)))),
            4,
        ).alias("t_stat"),
        F.round(F.avg("diff") / F.stddev_samp("diff"), 4).alias("cohens_dz"),
    )
