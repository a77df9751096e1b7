"""Least-squares changepoint detection on the daily value series
(SURVEY.md §2B time-series tier, round 10).

events_cusum flags WHEN a drift alarm would fire online; the offline
question "where did the level actually shift?" is the classic
single-changepoint least-squares fit (the binary-segmentation base
step — Scott & Knott 1974; the cost form is the one CUSUM/PELT
papers share, public): pick the split t minimizing
SSE_left(1..t) + SSE_right(t+1..T). Both segment SSEs are O(1) from
running sums — SSE = sum(x^2) - (sum x)^2/n — so the whole scan is
one cumulative window over the DAILY series, not a per-split pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "events_changepoint",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, ROUND(AVG(value), 6) AS x
    FROM events GROUP BY 1
),
cum AS (
    SELECT day, x,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
           SUM(x) OVER (ORDER BY day) AS c1,
           SUM(x * x) OVER (ORDER BY day) AS c2,
           CAST(COUNT(*) OVER () AS BIGINT) AS tt,
           SUM(x) OVER () AS s1,
           SUM(x * x) OVER () AS s2
    FROM daily
),
costs AS (
    SELECT day, t, tt, s1, s2,
           ROUND((c2 - c1 * c1 / t)
                 + ((s2 - c2) - (s1 - c1) * (s1 - c1) / (tt - t)), 6) AS cost
    FROM cum WHERE t < tt
)
SELECT day AS split_day, t AS split_t, tt AS n_days, cost,
       ROUND(1 - cost / (s2 - s1 * s1 / tt), 6) AS var_reduction
FROM costs
ORDER BY cost, day LIMIT 1
""",
    tags=("timeseries", "changepoint", "analytics"),
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single changepoint of the daily mean-value series by
    least-squares segmentation: running sums give every candidate
    split's two segment SSEs in closed form; the answer is the
    min-cost split with its variance-reduction share.

    Scale shape: the full-data pass is ONE combinable daily groupBy
    (calendar-bounded output); the cumulative window runs over that
    bounded daily table — the declared aggregate-bounded
    unpartitioned-window class — and the argmin is a TakeOrdered(1).
    Daily means round to 6 before the scan so both engines cum-sum
    identical sequences; the cost rounds again before the argmin so
    an ulp cannot flip the winning split."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.avg("value"), 6).alias("x")
    )
    wo = Window.orderBy("day")
    wall = Window.partitionBy()
    cum = daily.select(
        "day",
        "x",
        F.row_number().over(wo).cast("bigint").alias("t"),
        F.sum("x").over(wo).alias("c1"),
        F.sum(F.col("x") * F.col("x")).over(wo).alias("c2"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("tt"),
        F.sum("x").over(wall).alias("s1"),
        F.sum(F.col("x") * F.col("x")).over(wall).alias("s2"),
    )
    costs = cum.where(F.col("t") < F.col("tt")).select(
        "day",
        "t",
        "tt",
        "s1",
        "s2",
        F.round(
            (F.col("c2") - F.col("c1") * F.col("c1") / F.col("t"))
            + (
                (F.col("s2") - F.col("c2"))
                - (F.col("s1") - F.col("c1"))
                * (F.col("s1") - F.col("c1"))
                / (F.col("tt") - F.col("t"))
            ),
            6,
        ).alias("cost"),
    )
    return (
        costs.select(
            F.col("day").alias("split_day"),
            F.col("t").alias("split_t"),
            F.col("tt").alias("n_days"),
            "cost",
            F.round(
                1 - F.col("cost") / (F.col("s2") - F.col("s1") * F.col("s1") / F.col("tt")),
                6,
            ).alias("var_reduction"),
        )
        .orderBy("cost", "split_day")
        .limit(1)
    )
