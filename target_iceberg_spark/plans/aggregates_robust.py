"""Robust location estimators (SURVEY.md §2B aggregate tier, round 8).

Winsorized/trimmed means (Tukey; standard robust statistics) plus the
geometric and harmonic means — the estimators metric pipelines reach
for when agg_outlier_mad flags heavy tails: winsorizing clamps the
tail mass, trimming drops it, the geometric mean is the right average
for multiplicative quantities, the harmonic for rates. One query so
the four answers land from one pass over the bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

TRIM_P = 0.05  # two-sided winsorize/trim fraction


@register(
    "agg_robust_means",
    oracle=f"""
WITH bounds AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, {TRIM_P}) AS lo,
           quantile_cont(l_extendedprice, {1 - TRIM_P}) AS hi
    FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(l_extendedprice), 4) AS mean_price,
       ROUND(AVG(LEAST(GREATEST(l_extendedprice, b.lo), b.hi)), 4)
           AS winsor_mean,
       ROUND(AVG(l_extendedprice)
                 FILTER (WHERE l_extendedprice BETWEEN b.lo AND b.hi), 4)
           AS trim_mean,
       ROUND(exp(AVG(ln(l_extendedprice))), 4) AS geo_mean,
       ROUND(COUNT(*) / SUM(1.0 / l_extendedprice), 4) AS harm_mean
FROM lineitem l JOIN bounds b USING (l_returnflag)
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    tags=("aggregate", "robust", "stats"),
)
def agg_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four location estimators per return flag: the plain mean, the
    {TRIM_P:.0%}-winsorized mean (tails CLAMPED to the P5/P95
    bounds), the {TRIM_P:.0%}-trimmed mean (tails DROPPED), the
    geometric mean (exp∘avg∘ln — prices are positive), and the
    harmonic mean. Spark's percentile() and DuckDB's quantile_cont
    share the linear-interpolation rule, so the bounds — and hence
    every clamped value — agree bit-for-bit after rounding.

    Scale shape: pass 1 computes the per-group bounds (combinable
    percentile sketch per group, k-row output); the bounds broadcast
    back onto the fact scan; pass 2 is one combinable aggregate. No
    global sort, no window — the textbook two-pass robust-aggregate
    plan."""
    # fanout A/B (guide §2.5): the percentile pass ships every value to
    # 3 flag-keyed buffers off a single-split scan; the second pass's
    # broadcast-join + five-estimator fold is fused onto the same
    # single-task scan.
    li = load_table(spark, sf_dir, "lineitem", fanout=True)
    # ONE percentile aggregate with an array of fractions: two
    # separate percentile(x, p) expressions each buffer and sort the
    # group's values independently (measured ~0.5 s of the query);
    # the array form sorts once and reads both order statistics
    bounds = li.groupBy("l_returnflag").agg(
        F.expr(
            f"percentile(l_extendedprice, array({TRIM_P}, {1 - TRIM_P}))"
        ).alias("_b")
    ).select(
        "l_returnflag",
        F.col("_b")[0].alias("lo"),
        F.col("_b")[1].alias("hi"),
    )
    x = F.col("l_extendedprice")
    clamped = F.least(F.greatest(x, F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(x), 4).alias("mean_price"),
            F.round(F.avg(clamped), 4).alias("winsor_mean"),
            F.round(
                F.avg(F.when((x >= F.col("lo")) & (x <= F.col("hi")), x)), 4
            ).alias("trim_mean"),
            F.round(F.exp(F.avg(F.log(x))), 4).alias("geo_mean"),
            F.round(
                F.count(F.lit(1)) / F.sum(F.lit(1.0) / x), 4
            ).alias("harm_mean"),
        )
        .orderBy("l_returnflag")
    )
