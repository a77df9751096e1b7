"""Group-sequential SPRT monitoring (SURVEY.md §2B stats tier,
round 9).

Wald's Sequential Probability Ratio Test (Wald 1945, public) is how
an experimentation platform PEEKS at a running A/B test without
inflating false positives: keep a running log-likelihood ratio of
H1 (p = P1) against H0 (p = P0) over arriving conversions and stop
the moment it exits the (ln(beta/(1-alpha)), ln((1-beta)/alpha))
band. Per-user peeking is a sequential scan — hostile to a
distributed engine — so this runs the standard industrial variant:
GROUP-sequential checkpoints (a fixed number of user cohorts; Pocock
style interim looks), where each cohort's LLR contribution is a
combinable sum and only the checkpoint series (a plan literal's
worth of rows) is scanned cumulatively.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SPRT_P0 = 0.35  # H0 conversion rate (design hypothesis)
SPRT_P1 = 0.50  # H1 conversion rate (the lift worth stopping for)
SPRT_ALPHA = 0.05
SPRT_BETA = 0.20
SPRT_CHECKPOINTS = 20  # fixed interim looks — scale-independent
CONV_MIN_PURCHASES = 14  # a user converts at >= this many purchases


@register(
    "agg_sprt_ab",
    oracle=f"""
WITH u AS (
    SELECT user_id,
           CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase')
                     >= {CONV_MIN_PURCHASES} THEN 1 ELSE 0 END AS conv
    FROM events
    WHERE user_id % 2 = 1
    GROUP BY user_id
),
m AS (SELECT MAX(user_id) AS mx FROM u),
cohorts AS (
    -- FLOOR, not bare CAST: DuckDB's double->BIGINT cast rounds to
    -- nearest while Spark's truncates
    SELECT CAST(FLOOR(u.user_id * {SPRT_CHECKPOINTS} / (m.mx + 1)) AS BIGINT)
               AS checkpoint,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(conv) AS BIGINT) AS convs
    FROM u, m
    GROUP BY 1
),
cum AS (
    SELECT checkpoint,
           CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
           CAST(SUM(convs) OVER w AS BIGINT) AS conv_cum,
           SUM(convs * ln({SPRT_P1} / {SPRT_P0})
               + (n - convs) * ln((1 - {SPRT_P1}) / (1 - {SPRT_P0})))
               OVER w AS llr
    FROM cohorts
    WINDOW w AS (ORDER BY checkpoint
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT checkpoint, n_cum, conv_cum,
       ROUND(llr, 6) AS llr,
       CASE WHEN llr >= ln((1 - {SPRT_BETA}) / {SPRT_ALPHA})
            THEN 'accept_h1'
            WHEN llr <= ln({SPRT_BETA} / (1 - {SPRT_ALPHA}))
            THEN 'accept_h0'
            ELSE 'continue' END AS state
FROM cum
ORDER BY checkpoint
""",
    tags=("stats", "experimentation", "sequential"),
)
def agg_sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential SPRT over the treatment arm (odd user_ids):
    conversion = a user's purchase count >= {CONV_MIN_PURCHASES};
    users fold into {SPRT_CHECKPOINTS} fixed id-ordered cohorts, each
    contributing convs*ln(p1/p0) + fails*ln((1-p1)/(1-p0)) to the
    running LLR; a checkpoint's state reads the Wald band
    (ln(beta/(1-alpha)), ln((1-beta)/alpha)). On this corpus the
    observed treatment rate (~0.57) sits above P1={SPRT_P1}, so the
    monitor reaches accept_h1 — pinned in tests.

    Scale shape: the per-user conversion flag and the per-cohort LLR
    sums are combinable groupBys (the only event/user-volume
    stages); the cumulative scan runs over exactly
    {SPRT_CHECKPOINTS} rows (plan literal) at any corpus size — the
    sequential part of the sequential test never touches more than
    the interim-look table. Cohort ids derive from the one-row
    MAX(user_id) aggregate crossed onto the user frame."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("user_id") % 2 == 1)
        .groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= CONV_MIN_PURCHASES
            )
            .cast("int")
            .alias("conv")
        )
    )
    m = u.agg(F.max("user_id").alias("mx"))
    cohorts = (
        u.crossJoin(F.broadcast(m))
        .groupBy(
            (
                F.col("user_id") * SPRT_CHECKPOINTS / (F.col("mx") + 1)
            )
            .cast("bigint")
            .alias("checkpoint")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("conv").cast("bigint").alias("convs"),
        )
    )
    l1 = F.log(F.lit(SPRT_P1) / F.lit(SPRT_P0))
    l0 = F.log(F.lit(1 - SPRT_P1) / F.lit(1 - SPRT_P0))
    w = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cohorts.select(
        "checkpoint",
        F.sum("n").over(w).alias("n_cum"),
        F.sum("convs").over(w).alias("conv_cum"),
        F.sum(
            F.col("convs") * l1 + (F.col("n") - F.col("convs")) * l0
        )
        .over(w)
        .alias("_llr"),
    )
    hi = F.log(F.lit((1 - SPRT_BETA) / SPRT_ALPHA))
    lo = F.log(F.lit(SPRT_BETA / (1 - SPRT_ALPHA)))
    return cum.select(
        "checkpoint",
        "n_cum",
        "conv_cum",
        F.round("_llr", 6).alias("llr"),
        F.when(F.col("_llr") >= hi, "accept_h1")
        .when(F.col("_llr") <= lo, "accept_h0")
        .otherwise("continue")
        .alias("state"),
    ).orderBy("checkpoint")
