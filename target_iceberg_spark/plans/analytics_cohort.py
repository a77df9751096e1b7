"""Cohort lifetime-value curves (SURVEY.md §2B events/analytics tier,
round-6 post-window).

events_retention reports who comes back; this reports what they are
WORTH: users cohorted by first-seen week, each cohort's cumulative
value per user tracked across age weeks — the LTV curve growth
analytics reads against acquisition cost, and (for a data pipeline)
the per-cohort yield curve of a crawl or labeling campaign.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "events_cohort_ltv",
    oracle="""
WITH firsts AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
    FROM events GROUP BY user_id
),
sizes AS (
    SELECT cohort_w, CAST(COUNT(*) AS BIGINT) AS cohort_users
    FROM firsts GROUP BY cohort_w
),
act AS (
    SELECT f.cohort_w,
           CAST(FLOOR(date_diff('day', f.cohort_w,
                                date_trunc('week', e.ts)) / 7) AS INT)
               AS age_w,
           e.user_id, e.value
    FROM events e JOIN firsts f ON e.user_id = f.user_id
),
cell AS (
    SELECT cohort_w, age_w,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
           SUM(value) AS vsum
    FROM act GROUP BY cohort_w, age_w
),
cum AS (
    SELECT cohort_w, age_w, n_active,
           SUM(vsum) OVER (PARTITION BY cohort_w ORDER BY age_w
                           ROWS UNBOUNDED PRECEDING) AS cum_value
    FROM cell
)
SELECT cohort_w AS cohort_week, age_w AS age_week,
       sizes.cohort_users, n_active,
       ROUND(n_active * 1.0 / sizes.cohort_users, 4) AS retention,
       ROUND(cum_value / sizes.cohort_users, 4) AS ltv_per_user
FROM cum JOIN sizes USING (cohort_w)
ORDER BY cohort_week, age_week
""",
    tags=("events", "cohort", "analytics"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-cohort LTV curve: users cohorted by the week of their
    FIRST event, then for every (cohort, age-in-weeks) cell the active
    user count, retention vs cohort size, and the cohort's CUMULATIVE
    value per user — the curve whose flattening says a cohort is
    mined out. Ages come from calendar week-truncation on both sides
    (so the day difference is an exact multiple of 7 and the /7 cast
    is engine-exact), not row offsets — the gappy-series discipline.

    Scale shape: first-seen is one combinable MIN per user; the
    cohort tag joins back on user_id (at 100 TB both sides shuffle
    once on user_id, or the firsts side broadcasts per AQE); the cell
    rollup is combinable with the distinct-user count riding the same
    shuffle (two-phase partial distinct); the cumulative sum runs
    inside a cohort-partitioned window over at most age-weeks rows —
    the whitelisted bounded-window class. Ratios round at the end
    only."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    sizes = firsts.groupBy("cohort_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    act = ev.join(firsts, "user_id").select(
        "cohort_w",
        F.floor(
            F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_w"))
            / 7
        )
        .cast("int")
        .alias("age_w"),
        "user_id",
        "value",
    )
    cell = act.groupBy("cohort_w", "age_w").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active"),
        F.sum("value").alias("vsum"),
    )
    w = (
        Window.partitionBy("cohort_w")
        .orderBy("age_w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.withColumn("cum_value", F.sum("vsum").over(w))
    return (
        cum.join(sizes, "cohort_w")
        .select(
            F.col("cohort_w").alias("cohort_week"),
            F.col("age_w").alias("age_week"),
            "cohort_users",
            "n_active",
            F.round(
                F.col("n_active") * 1.0 / F.col("cohort_users"), 4
            ).alias("retention"),
            F.round(F.col("cum_value") / F.col("cohort_users"), 4).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_week", "age_week")
    )
