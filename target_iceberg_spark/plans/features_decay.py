"""Recency-decayed feature aggregates (SURVEY.md §2B events/feature
tier, round-6 post-window).

The feature-store staple: per-entity activity features where each
event's contribution decays exponentially with age, sum(v * e^(-l *
age)) — recency-weighted counts and values that a ranking model reads
instead of raw lifetime totals. Unlike a sliding window it needs no
window at all: the decayed sum is a plain combinable aggregation,
which is exactly why it is THE scalable recency feature at 100 TB
(and why streaming systems maintain it incrementally: the same sum
advances by multiplying in the elapsed decay).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

DECAY_HALFLIFE_D = 7.0  # one-week half-life
_LAMBDA = math.log(2.0) / DECAY_HALFLIFE_D


@register(
    "events_decay_features",
    oracle=f"""
WITH ref AS (SELECT MAX(ts) AS t_ref FROM events),
aged AS (
    SELECT user_id,
           value,
           date_diff('second', ts, t_ref) / 86400.0 AS age_d
    FROM events CROSS JOIN ref
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(exp(-{_LAMBDA!r} * age_d)), 4) AS decayed_count,
       ROUND(SUM(value * exp(-{_LAMBDA!r} * age_d)), 4) AS decayed_value,
       ROUND(MIN(age_d), 4) AS last_seen_days
FROM aged
GROUP BY user_id
ORDER BY user_id
""",
    tags=("events", "features", "decay"),
)
def events_decay_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency-decayed features at the corpus watermark
    (reference time = max event ts): event count, decayed count
    sum(e^(-l*age)), decayed value sum(v*e^(-l*age)) with a
    {DECAY_HALFLIFE_D:.0f}-day half-life, and days since last seen —
    the feature vector a ranking/churn model consumes, where one
    purchase last night outweighs ten from last year.

    Scale shape: ONE one-row watermark aggregate broadcast-crossed,
    then ONE combinable per-user aggregation — no window, no sort, no
    per-user state; this is the shape that makes exponential decay
    the 100 TB recency feature (a sliding-window count would need the
    raw events; the decayed sum folds map-side). Ages are exact
    second differences over 86400.0; exp/round(4) is the established
    float discipline. The half-life constant is embedded identically
    ({_LAMBDA!r}) in both plans."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts").alias("t_ref"))
    aged = ev.crossJoin(F.broadcast(ref)).select(
        "user_id",
        "value",
        (
            (
                F.unix_timestamp("t_ref").cast("double")
                - F.unix_timestamp("ts").cast("double")
            )
            / 86400.0
        ).alias("age_d"),
    )
    decay = F.exp(-_LAMBDA * F.col("age_d"))
    return (
        aged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(decay), 4).alias("decayed_count"),
            F.round(F.sum(F.col("value") * decay), 4).alias("decayed_value"),
            F.round(F.min("age_d"), 4).alias("last_seen_days"),
        )
        .orderBy("user_id")
    )
