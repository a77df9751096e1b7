"""Declarative data-expectation rules (SURVEY.md §2B data-quality
tier, round-5 post-window).

The Deequ / Great Expectations pattern, public and standard: a rule
suite (not-null, accepted range, accepted values, date bounds,
uniqueness) evaluated over a table in ONE pass, reported as per-rule
pass rates. profile_columns answers "what does the data look like";
this answers the production gate question "does the data satisfy the
contract" — the check every ingest pipeline runs before publishing a
partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

MAX_PRICE = 450_000.0
MAX_DATE = "2001-06-30"


@register(
    "profile_expectations",
    oracle=f"""
WITH agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS f_null,
           CAST(SUM(CASE WHEN o_totalprice < 0
                         OR o_totalprice > {MAX_PRICE}
                    THEN 1 ELSE 0 END) AS BIGINT) AS f_range,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 ELSE 0 END) AS BIGINT) AS f_values,
           CAST(SUM(CASE WHEN o_orderdate > DATE '{MAX_DATE}'
                    THEN 1 ELSE 0 END) AS BIGINT) AS f_date,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS f_uniq
    FROM orders
),
rules AS (
    SELECT 'not_null(o_custkey)' AS rule, n_rows, f_null AS n_failed FROM agg
    UNION ALL
    SELECT 'range(o_totalprice,0,{MAX_PRICE})', n_rows, f_range FROM agg
    UNION ALL
    SELECT 'values(o_orderstatus)', n_rows, f_values FROM agg
    UNION ALL
    SELECT 'date_max(o_orderdate,{MAX_DATE})', n_rows, f_date FROM agg
    UNION ALL
    SELECT 'unique(o_orderkey)', n_rows, f_uniq FROM agg
)
SELECT rule, n_rows AS n_checked, n_failed,
       ROUND(1.0 - CAST(n_failed AS DOUBLE) / n_rows, 6) AS pass_rate,
       (n_failed = 0) AS passed
FROM rules
ORDER BY rule
""",
    tags=("profiling", "quality", "expectations"),
)
def profile_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite over orders in ONE scan: not-null,
    numeric range, accepted values, date upper bound, and key
    uniqueness, each reported as (n_checked, n_failed, pass_rate,
    passed). Two rules intentionally discriminate on this corpus
    (price cap {MAX_PRICE}, date cap {MAX_DATE}) so the report shows
    real failures, not a wall of green.

    Scale shape: four rules are conditional SUMs — pure map-side
    combinable, one scan, one row out; uniqueness needs COUNT(DISTINCT
    key), which Catalyst plans as the standard two-phase
    partial-distinct expand over the SAME scan (no second read). The
    per-rule unpivot (stack) runs on the single aggregate row. At
    100 TB swap exact uniqueness for approx_count_distinct and the
    rest of the suite is unchanged — the exact form is kept here
    because the oracle must hash-match."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("int")).alias("f_null"),
        F.sum(
            (
                (F.col("o_totalprice") < 0)
                | (F.col("o_totalprice") > MAX_PRICE)
            ).cast("int")
        ).alias("f_range"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("int")
        ).alias("f_values"),
        F.sum(
            (F.col("o_orderdate") > F.lit(MAX_DATE).cast("date")).cast("int")
        ).alias("f_date"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("f_uniq"),
    )
    rules = agg.select(
        F.expr(
            f"stack(5, "
            f"'not_null(o_custkey)', f_null, "
            f"'range(o_totalprice,0,{MAX_PRICE})', f_range, "
            f"'values(o_orderstatus)', f_values, "
            f"'date_max(o_orderdate,{MAX_DATE})', f_date, "
            f"'unique(o_orderkey)', f_uniq"
            f") AS (rule, n_failed)"
        ),
        F.col("n_rows").alias("n_checked"),
    )
    return rules.select(
        "rule",
        "n_checked",
        F.col("n_failed").cast("bigint").alias("n_failed"),
        F.round(
            1.0 - F.col("n_failed").cast("double") / F.col("n_checked"), 6
        ).alias("pass_rate"),
        (F.col("n_failed") == 0).alias("passed"),
    ).orderBy("rule")
