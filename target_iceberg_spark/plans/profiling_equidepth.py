"""Equi-depth histogram construction (SURVEY.md §2B profiling tier,
round 10).

profile_selectivity_audit consumes an equi-WIDTH histogram and shows
where it mispredicts under skew; the fix every optimizer ships
(Piatetsky-Shapiro & Connell SIGMOD 1984; Spark's own ANALYZE TABLE
histograms, public) is equi-DEPTH: boundaries at quantiles, so each
bucket holds ~N/B rows no matter how skewed the values. Building one
is two passes — a percentile aggregate for the boundaries, then a
bounded fold classifying each row against the broadcast boundary
array — and the result is the statistics object CBO selectivity
estimates divide by.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ED_B = 8  # buckets; interior boundaries at i/B quantiles
ED_FRACS = tuple(round(i / ED_B, 6) for i in range(1, ED_B))


@register(
    "profile_equidepth_histogram",
    oracle=f"""
WITH bounds AS (
    SELECT list_transform(
               quantile_cont(o_totalprice, {list(ED_FRACS)}),
               b -> ROUND(b, 6)) AS bs
    FROM orders
),
bucketed AS (
    SELECT o.o_totalprice AS v,
           list_sum(list_transform(b.bs,
               x -> CASE WHEN o.o_totalprice > x THEN 1 ELSE 0 END)) AS bucket
    FROM orders o CROSS JOIN bounds b
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(v), 2) AS lo,
       ROUND(MAX(v), 2) AS hi
FROM bucketed
GROUP BY bucket
ORDER BY bucket
""",
    tags=("profiling", "histogram", "statistics", "cbo"),
)
def profile_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{ED_B}-bucket equi-depth histogram of order totals: interior
    boundaries at the exact i/{ED_B} quantiles (rounded to 6 on both
    engines before any comparison), each row classified by counting
    boundaries below it with one array fold, per-bucket row count and
    [lo, hi] range — near-equal n per bucket by construction.

    Scale shape: pass one is a single percentile aggregate (sort-based
    within the aggregate, no global sort materialized); pass two
    crosses the ONE-row boundary array onto the scan and classifies
    with a codegen lambda fold — no join, no window, no per-bucket
    subquery — then a {ED_B}-row combinable groupBy. At 100 TB the
    exact percentile is the piece to swap for approx_percentile; the
    plan shape is otherwise already the scalable one."""
    orders = load_table(spark, sf_dir, "orders")
    fracs = "array(" + ", ".join(str(f) for f in ED_FRACS) + ")"
    bounds = orders.agg(
        F.expr(
            f"transform(percentile(o_totalprice, {fracs}), b -> round(b, 6))"
        ).alias("bs")
    )
    bucketed = orders.select(F.col("o_totalprice").alias("v")).crossJoin(
        F.broadcast(bounds)
    ).select(
        "v",
        F.expr(
            "aggregate(bs, 0, (acc, x) -> acc + CASE WHEN v > x THEN 1 ELSE 0 END)"
        ).alias("bucket"),
    )
    return (
        bucketed.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )
