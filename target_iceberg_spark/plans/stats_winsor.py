"""Winsorized moments (SURVEY.md §2B stats tier, round 9).

agg_robust_means (round 8) reports the trimmed/winsorized MEAN
family at fixed cut points; experimentation platforms additionally
standardize on winsorized VARIANCE for metric capping: clamp each
observation into the [p05, p95] band of its own group and publish
the capped mean/sd next to the raw ones, plus how many observations
each side clamped — the standard heavy-tail guard (Tukey; Dixon &
Tukey 1968, public) applied per metric segment before a t-test.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

WINSOR_LO = 0.05
WINSOR_HI = 0.95


@register(
    "agg_winsorized_stats",
    oracle=f"""
WITH cuts AS (
    SELECT event_type,
           quantile_cont(value, {WINSOR_LO}) AS lo,
           quantile_cont(value, {WINSOR_HI}) AS hi
    FROM events GROUP BY event_type
),
clamped AS (
    SELECT e.event_type,
           LEAST(GREATEST(e.value, c.lo), c.hi) AS w,
           CASE WHEN e.value < c.lo THEN 1 ELSE 0 END AS clo,
           CASE WHEN e.value > c.hi THEN 1 ELSE 0 END AS chi
    FROM events e JOIN cuts c USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(w), 4) AS mean_w,
       ROUND(stddev_samp(w), 4) AS sd_w,
       CAST(SUM(clo) AS BIGINT) AS n_clamped_lo,
       CAST(SUM(chi) AS BIGINT) AS n_clamped_hi
FROM clamped
GROUP BY event_type
ORDER BY event_type
""",
    tags=("stats", "robust", "experimentation"),
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorized moments: exact [p{WINSOR_LO:.0%},
    p{WINSOR_HI:.0%}] group cut points, every value clamped into its
    group's band, then capped mean/sd plus per-side clamp counts —
    the metric-capping pass an A/B platform runs before variance
    estimation so one whale user cannot own the confidence interval.

    Scale shape: one exact-percentile aggregate per group (Spark's
    percentile is a single-pass grouped aggregate — no global sort),
    the tiny k-row cut table broadcast back onto the stream, and one
    combinable moment aggregate. Clamp comparisons are strict (< lo,
    > hi) against thresholds that interpolate BETWEEN adjacent data
    values, so the ulp-level interpolation difference between engines
    cannot flip any clamp decision; the threshold's own ulp washes
    out in the 4 dp rounding."""
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(WINSOR_LO)).alias("lo"),
        F.percentile("value", F.lit(WINSOR_HI)).alias("hi"),
    )
    w = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    clamped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        w.alias("w"),
        F.when(F.col("value") < F.col("lo"), 1).otherwise(0).alias("clo"),
        F.when(F.col("value") > F.col("hi"), 1).otherwise(0).alias("chi"),
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("w"), 4).alias("mean_w"),
            F.round(F.stddev_samp("w"), 4).alias("sd_w"),
            F.sum("clo").cast("bigint").alias("n_clamped_lo"),
            F.sum("chi").cast("bigint").alias("n_clamped_hi"),
        )
        .orderBy("event_type")
    )
