"""Event-order integrity audit (SURVEY.md §2B profiling tier,
round 8).

Does assignment order agree with event time? Sequence ids that run
BACKWARD against timestamps break every downstream assumption the
events tier leans on — as-of joins pick the wrong version, watermark
reasoning under-counts lateness, SCD intervals invert. This audit
counts adjacent inversions (id decreases between consecutive events
in time order) per user and corpus-wide — the cheap canary a 100 TB
ingest runs after every load, next to profile_fk_integrity (cross-
table) and profile_expectations (per-column).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "profile_order_inversions",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_id,
           lag(event_id) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_id
    FROM events
),
per_user AS (
    SELECT user_id,
           CAST(COUNT(prev_id) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) FILTER (WHERE event_id < prev_id) AS BIGINT)
               AS n_inv
    FROM ordered GROUP BY user_id
)
SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
       CAST(SUM(n_inv) AS BIGINT) AS n_inversions,
       ROUND(CAST(SUM(n_inv) AS DOUBLE) / SUM(n_pairs), 6)
           AS inversion_rate,
       CAST(COUNT(*) FILTER (WHERE n_inv > 0) AS BIGINT)
           AS n_users_affected,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user
""",
    tags=("profiling", "integrity", "ordering"),
)
def profile_order_inversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent id-vs-time inversions: within each user's time-ordered
    event sequence, how often does event_id step BACKWARD? Reported as
    the corpus pair count, inversion count and rate, and how many
    users carry at least one inversion — zero on a clean assignment,
    and any nonzero value localizes to users for triage.

    Scale shape: one per-user lag window (partitioned — never
    global), one combinable per-user aggregate, one 5-number final
    rollup. The quadratic global-inversion count (every pair, not
    just adjacent) is deliberately NOT computed: adjacent inversions
    are nonzero iff any inversion exists, which is the audit
    question."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
    )
    per_user = ordered.groupBy("user_id").agg(
        F.count("prev_id").alias("n_pairs"),
        F.count(
            F.when(F.col("event_id") < F.col("prev_id"), 1)
        ).alias("n_inv"),
    )
    return per_user.agg(
        F.sum("n_pairs").cast("bigint").alias("n_pairs"),
        F.sum("n_inv").cast("bigint").alias("n_inversions"),
        F.round(
            F.sum("n_inv").cast("double") / F.sum("n_pairs"), 6
        ).alias("inversion_rate"),
        F.count(F.when(F.col("n_inv") > 0, 1))
        .cast("bigint")
        .alias("n_users_affected"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
