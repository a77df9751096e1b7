"""Categorical-value profiling (SURVEY.md §2B data-quality tier,
round-5 post-window).

profile_columns / profile_moments summarize NUMERIC shape; this adds
the categorical half every profiler ships: the top-k most frequent
values per column, the one-glance view that catches skewed categories,
mis-coded enums, and placeholder pollution ('', 'N/A') before a
pipeline trains on them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PROFILE_TOP_VALUES = 5


@register(
    "profile_topk_values",
    oracle=f"""
WITH unpivoted AS (
    SELECT 'o_orderstatus' AS col_name, o_orderstatus AS value FROM orders
    UNION ALL
    SELECT 'o_orderpriority', o_orderpriority FROM orders
    UNION ALL
    SELECT 'o_year', CAST(year(o_orderdate) AS VARCHAR) FROM orders
),
counted AS (
    SELECT col_name, value, CAST(COUNT(*) AS BIGINT) AS n
    FROM unpivoted GROUP BY col_name, value
)
SELECT col_name, value, n, CAST(rnk AS INT) AS rnk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY col_name ORDER BY n DESC, value) AS rnk
    FROM counted
)
WHERE rnk <= {PROFILE_TOP_VALUES}
ORDER BY col_name, rnk
""",
    tags=("profiling", "quality"),
)
def profile_topk_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most frequent values for each profiled
    categorical column of orders (status, priority, derived year) in
    ONE pass: a plan-level unpivot (stack — an Expand node, no
    shuffle, no second scan) fans each row into (col_name, value)
    pairs, one combinable count aggregates them, and the rank window
    runs over the already-aggregated DISTINCT-VALUE table partitioned
    by col_name — its input is bounded by value cardinality, never row
    count, the same pre-aggregate-then-rank discipline as
    events_window_topk.

    At 100 TB this is the profile you can actually afford: the only
    full-data stage is the map-side-combining count; everything after
    operates on #distinct-values rows."""
    orders = load_table(spark, sf_dir, "orders")
    unpivoted = orders.select(
        F.expr(
            "stack(3, "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_year', CAST(year(o_orderdate) AS STRING)"
            ") AS (col_name, value)"
        )
    )
    counted = unpivoted.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    rnk = F.row_number().over(
        Window.partitionBy("col_name").orderBy(F.desc("n"), "value")
    )
    return (
        counted.withColumn("rnk", rnk)
        .where(F.col("rnk") <= PROFILE_TOP_VALUES)
        .orderBy("col_name", "rnk")
    )


@register(
    "profile_entropy",
    oracle="""
WITH unpivoted AS (
    SELECT 'o_orderstatus' AS col_name, o_orderstatus AS value FROM orders
    UNION ALL
    SELECT 'o_orderpriority', o_orderpriority FROM orders
    UNION ALL
    SELECT 'o_year', CAST(year(o_orderdate) AS VARCHAR) FROM orders
),
counted AS (
    SELECT col_name, value, CAST(COUNT(*) AS DOUBLE) AS n
    FROM unpivoted GROUP BY col_name, value
)
SELECT col_name,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(ln(SUM(n)) - SUM(n * ln(n)) / SUM(n), 6) AS entropy_nats
FROM counted
GROUP BY col_name
ORDER BY col_name
""",
    tags=("profiling", "quality", "entropy"),
)
def profile_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy per profiled categorical column — the
    one-number concentration metric beside profile_topk_values' value
    list: near-zero entropy flags a constant/degenerate column, a
    drop between ingests flags a category collapsing (the same class
    of signal profile_drift_psi tracks for numeric bands).

    Computed via the count-side identity H = ln(N) - Σ n·ln(n) / N,
    which needs ONLY the per-(col, value) counts — so the full-data
    stage is the same single map-side-combining count as
    profile_topk_values, and the entropy itself is arithmetic over
    #distinct-values rows. Transcendental ln rounded on both sides per
    the registry convention."""
    orders = load_table(spark, sf_dir, "orders")
    unpivoted = orders.select(
        F.expr(
            "stack(3, "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_year', CAST(year(o_orderdate) AS STRING)"
            ") AS (col_name, value)"
        )
    )
    counted = unpivoted.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    return (
        counted.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.log(F.sum("n")) - F.sum(F.col("n") * F.log("n")) / F.sum("n"),
                6,
            ).alias("entropy_nats"),
        )
        .orderBy("col_name")
    )
