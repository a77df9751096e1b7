"""Robust statistics + error-safe arithmetic (SURVEY.md §2B
data-quality tier, round-5 post-window).

events_anomaly flags outliers by z-score — which a single extreme
value corrupts, because the outlier inflates the very mean/std used to
judge it. The Median-Absolute-Deviation detector here is the robust
twin (50% breakdown point). fn_try_arithmetic covers Spark 4's
ANSI-mode-safe `try_*` function family: under ANSI (default since
4.0) a division by zero is a hard ERROR mid-pipeline; try_divide and
friends are the declarative null-on-failure escape hatch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

MAD_K = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma for normals
MAD_CUTOFF = 3.0


@register(
    "agg_outlier_mad",
    oracle=f"""
WITH med AS (
    SELECT event_type, median(CAST(value AS DOUBLE)) AS m
    FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_type, m, abs(CAST(value AS DOUBLE) - m) AS d
    FROM events e JOIN med USING (event_type)
),
mad AS (
    SELECT event_type, m, median(d) AS mad
    FROM dev GROUP BY event_type, m
)
SELECT d.event_type,
       ROUND(mad.m, 6) AS med_value,
       ROUND(mad.mad, 6) AS mad_value,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (d.d > {MAD_CUTOFF} * {MAD_K} * mad.mad)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad USING (event_type)
GROUP BY d.event_type, mad.m, mad.mad
ORDER BY d.event_type
""",
    tags=("aggregation", "quality", "robust"),
)
def agg_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median + Median
    Absolute Deviation instead of mean + std (events_anomaly's
    z-score), so a single billion-dollar glitch row cannot inflate the
    spread estimate that is supposed to catch it — the detector data
    pipelines actually want at the bronze layer, where the corrupt
    rows ARE the target.

    Shape: two exact-median passes (per-type median, then median of
    absolute deviations) and a final combinable conditional count;
    the tiny per-type median tables ride broadcast joins back onto the
    fact rows. Exact medians are chosen because they are
    oracle-checkable bit-for-bit (both engines interpolate the even-N
    midpoint identically on doubles); at 100 TB the same plan runs
    with approx_percentile(0.5) — swap one function, keep the
    structure. The outlier comparison is on raw doubles: both engines
    derive d and mad from identical arithmetic, so the predicate is
    deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "m", F.abs(F.col("value") - F.col("m")).alias("d")
    )
    mad = dev.groupBy("event_type", "m").agg(F.median("d").alias("mad"))
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type", "m", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(F.col("d") > MAD_CUTOFF * MAD_K * F.col("mad"), 1)
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("m", 6).alias("med_value"),
            F.round("mad", 6).alias("mad_value"),
            "n",
            "n_outliers",
        )
        .orderBy("event_type")
    )


@register(
    "fn_try_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity - 1 = 0 THEN NULL
            ELSE l_extendedprice / (l_quantity - 1) END
           AS safe_ratio,
       string_split(strftime(l_shipdate, '%Y-%m-%d'), '-')[5] AS part5,
       string_split(strftime(l_shipdate, '%Y-%m-%d'), '-')[1] AS ship_year
FROM lineitem
WHERE l_orderkey < 2000
""",
    tags=("function", "ansi", "try"),
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ANSI-mode-safe arithmetic: under ANSI (the 4.0
    default), a division by zero KILLS the job mid-pipeline; the
    `try_*` family turns per-row failures into NULLs declaratively —
    try_divide hits real zero denominators here (quantity-1 rows), and
    try_element_at reads past an array's end without erroring. Both
    stay whole-stage-codegen expressions — error-safety without a UDF
    or a pre-filter pass. The oracle mirrors each with explicit CASE /
    native out-of-bounds-NULL semantics, which is exactly the
    behavioral claim under test."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    parts = F.split(F.date_format("l_shipdate", "yyyy-MM-dd"), "-")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # UNROUNDED by design: both engines compute the identical
        # double division, so the bits match exactly — while cents
        # divided by small integers land on .5 rounding boundaries
        # often enough that ROUND(x, 6) would diverge (half-up vs
        # half-even) on real rows
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 1).alias(
            "safe_ratio"
        ),
        F.try_element_at(parts, F.lit(5)).alias("part5"),
        F.try_element_at(parts, F.lit(1)).alias("ship_year"),
    )
