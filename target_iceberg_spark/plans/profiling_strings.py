"""String-length profiling (SURVEY.md §2B profiling tier, round 7,
post-window).

profile_columns counts nulls and distincts; DDL sizing, truncation
risk, and "did an ETL stage start emitting empty strings" need the
LENGTH distribution per string column — min/avg/p95/max plus the
empty-string count, in one unpivoted pass (the profile_topk_values
stack/Expand discipline: no shuffle to pivot, no second scan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

STR_COLS = ("c_name", "c_mktsegment")


@register(
    "profile_string_lengths",
    oracle=f"""
WITH unpivoted AS (
    SELECT 'c_name' AS col, length(c_name) AS len,
           CASE WHEN c_name = '' THEN 1 ELSE 0 END AS empty
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', length(c_mktsegment),
           CASE WHEN c_mktsegment = '' THEN 1 ELSE 0 END
    FROM customer
)
SELECT col,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(MIN(len) AS BIGINT) AS min_len,
       ROUND(AVG(len), 2) AS avg_len,
       ROUND(quantile_cont(len, 0.95), 2) AS p95_len,
       CAST(MAX(len) AS BIGINT) AS max_len,
       CAST(SUM(empty) AS BIGINT) AS n_empty
FROM unpivoted
GROUP BY col
ORDER BY col
""",
    tags=("profiling", "strings", "quality"),
)
def profile_string_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length distribution per profiled string column of customer
    (min/avg/p95/max, empty-string count) — the numbers behind
    VARCHAR sizing, truncation-risk review, and catching an upstream
    stage that began emitting blanks. One plan-level unpivot (stack —
    an Expand node: each row fans into (col, len) pairs with NO
    shuffle and no per-column scan) feeds one combinable grouped
    aggregate; exact p95 via the shared percentile/quantile_cont
    interpolation rule, grouped by a {len(STR_COLS)}-column bounded
    key."""
    cust = load_table(spark, sf_dir, "customer")
    stack_expr = ", ".join(f"'{c}', length({c})" for c in STR_COLS)
    unpivoted = cust.select(
        F.expr(f"stack({len(STR_COLS)}, {stack_expr}) AS (col, len)"),
        *[
            F.when(F.col(c) == "", 1).otherwise(0).alias(f"_e_{c}")
            for c in STR_COLS
        ],
    ).select(
        "col",
        "len",
        # pick the matching column's empty flag post-stack
        F.when(F.col("col") == STR_COLS[0], F.col(f"_e_{STR_COLS[0]}"))
        .otherwise(F.col(f"_e_{STR_COLS[1]}"))
        .alias("empty"),
    )
    return (
        unpivoted.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.min("len").cast("long").alias("min_len"),
            F.round(F.avg("len"), 2).alias("avg_len"),
            F.round(F.expr("percentile(len, 0.95)"), 2).alias("p95_len"),
            F.max("len").cast("long").alias("max_len"),
            F.sum("empty").cast("long").alias("n_empty"),
        )
        .orderBy("col")
    )
