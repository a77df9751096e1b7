"""Distribution-free median confidence interval via order statistics
(SURVEY.md §2B stats tier, round 10).

`agg_bootstrap_ci` gets a CI by md5-deterministic resampling; the
classical alternative needs NO resampling at all: the binomial
argument (Conover, Practical Nonparametric Statistics §3.2, public)
says the order statistics at ranks n/2 +- z*sqrt(n)/2 bracket the
true median with ~95% coverage, for ANY continuous distribution.
That makes it the cheapest robust uncertainty statement a metrics
platform can attach to a per-segment median — one rank pass, no
replicates — and the natural cross-check for the bootstrap tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

Z95 = 1.959964  # two-sided 95% normal quantile (A&S 26.2.23, public)


@register(
    "agg_median_order_ci",
    oracle=f"""
WITH ranked AS (
    SELECT event_type, value,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS BIGINT) AS rk,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM events
),
bounds AS (
    SELECT event_type, n,
           GREATEST(CAST(FLOOR((n - {Z95} * SQRT(n)) / 2) AS BIGINT), 1) AS lo_rk,
           LEAST(CAST(CEIL(1 + (n + {Z95} * SQRT(n)) / 2) AS BIGINT), n) AS hi_rk,
           CAST(CEIL(n / 2.0) AS BIGINT) AS med_rk
    FROM ranked GROUP BY event_type, n
)
SELECT b.event_type, b.n,
       ROUND(MAX(CASE WHEN r.rk = b.lo_rk THEN r.value END), 6) AS ci_lo,
       ROUND(MAX(CASE WHEN r.rk = b.med_rk THEN r.value END), 6) AS median_os,
       ROUND(MAX(CASE WHEN r.rk = b.hi_rk THEN r.value END), 6) AS ci_hi
FROM ranked r JOIN bounds b USING (event_type)
WHERE r.rk IN (b.lo_rk, b.med_rk, b.hi_rk)
GROUP BY b.event_type, b.n
ORDER BY b.event_type
""",
    tags=("stats", "robust", "quantile", "nonparametric"),
)
def agg_median_order_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 95% median CI from order statistics: rank the
    values once, compute the binomial bounds lo = floor((n - z sqrt n)/2)
    and hi = ceil(1 + (n + z sqrt n)/2) (clamped to [1, n]), and pick
    the values at those ranks plus the ceil(n/2) order-statistic
    median — no resampling, no replicate pass.

    Scale shape: one window rank partitioned by the group key (the
    well-partitioned class — each partition sorts independently; at
    100 TB with few huge groups, the full rank is the piece to swap
    for a two-pass selection — approx_percentile brackets the three
    target ranks, a second filtered pass ranks only the bracket — the
    same exact-arm-vs-sketch trade documented on
    profile_equidepth_histogram), a
    k-row bounds table derived from the same pass, and a semi-join
    that keeps exactly 3 rows per group before a k-row final
    aggregate. The IN-filter prunes the ranked table BEFORE the
    pivot, so the second stage moves 3k rows, not N. Ties broken by
    event_id so both engines pick identical order statistics."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("bigint")
        .alias("n"),
    )
    n = F.col("n")
    bounds = ranked.groupBy("event_type", "n").agg(F.lit(1).alias("_one")).select(
        "event_type",
        "n",
        F.greatest(
            F.floor((n - F.lit(Z95) * F.sqrt(n)) / 2).cast("bigint"), F.lit(1).cast("bigint")
        ).alias("lo_rk"),
        F.least(
            F.ceil(1 + (n + F.lit(Z95) * F.sqrt(n)) / 2).cast("bigint"), n
        ).alias("hi_rk"),
        F.ceil(n / F.lit(2.0)).cast("bigint").alias("med_rk"),
    )
    picked = (
        ranked.drop("n")
        .join(F.broadcast(bounds), "event_type")
        .where(
            (F.col("rk") == F.col("lo_rk"))
            | (F.col("rk") == F.col("med_rk"))
            | (F.col("rk") == F.col("hi_rk"))
        )
    )
    return (
        picked.groupBy("event_type", "n")
        .agg(
            F.round(F.max(F.when(F.col("rk") == F.col("lo_rk"), F.col("value"))), 6).alias("ci_lo"),
            F.round(F.max(F.when(F.col("rk") == F.col("med_rk"), F.col("value"))), 6).alias("median_os"),
            F.round(F.max(F.when(F.col("rk") == F.col("hi_rk"), F.col("value"))), 6).alias("ci_hi"),
        )
        .select("event_type", "n", "ci_lo", "median_os", "ci_hi")
        .orderBy("event_type")
    )
