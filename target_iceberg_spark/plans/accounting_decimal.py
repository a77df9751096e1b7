"""Exact decimal accounting (SURVEY.md §2B aggregation tier, round 7,
post-window).

Every other monetary aggregate in the catalog rides DOUBLE and rounds
at the output boundary — fine for analytics, wrong for a LEDGER: IEEE
754 cannot represent 0.10, and a billion-row revenue sum silently
drifts by the accumulated ulp. This query is the engine's fixed-point
story: DECIMAL in, exact DECIMAL arithmetic through the whole plan
(Spark's Decimal128 and DuckDB's DECIMAL share exact base-10
semantics at matched precision/scale), plus a column quantifying how
far the double-precision shortcut drifts from the exact answer — the
number that justifies decimal columns in a financial lakehouse.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "agg_decimal_ledger",
    oracle="""
WITH d AS (
    SELECT l_returnflag,
           CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
           CAST(l_discount AS DECIMAL(18,2)) AS disc,
           l_extendedprice * (1 - l_discount) AS net_double
    FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(CAST(SUM(price) AS DECIMAL(30,2)) AS VARCHAR) AS gross_exact,
       CAST(CAST(SUM(price * (1 - disc)) AS DECIMAL(30,4)) AS VARCHAR)
           AS net_exact,
       ROUND(ABS(SUM(net_double)
                 - CAST(SUM(price * (1 - disc)) AS DOUBLE)), 4)
           AS double_drift
FROM d
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "decimal", "accounting"),
)
def agg_decimal_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue ledger per return flag in EXACT base-10 arithmetic:
    price and discount cast to DECIMAL(18,2) at the scan, the net
    extension price*(1-disc) carried at the product's natural scale 4
    with no rounding anywhere (outputs pin the declared scale and then
    render AS STRINGS — DuckDB's pandas bridge strips trailing decimal
    zeros, so the fixed-scale string is the portable exact form), next
    to the
    absolute drift of the conventional double-precision sum — here
    small, but growing with row count, which is the point.

    Scale shape: one combinable grouped aggregation; decimal sums are
    associative and commutative EXACTLY (unlike doubles, where Spark's
    partial-aggregation order is nondeterministic and only rounding
    hides it), so this is the one aggregate family whose map-side
    combine is bit-stable by construction. Decimal128 math is
    whole-stage-codegen JVM arithmetic — no Python, no UDF."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    d = li.select(
        "l_returnflag",
        price.alias("price"),
        disc.alias("disc"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net_double"
        ),
    )
    return (
        d.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("price")
            .cast("decimal(30,2)")
            .cast("string")
            .alias("gross_exact"),
            F.sum(F.col("price") * (1 - F.col("disc")))
            .cast("decimal(30,4)")
            .cast("string")
            .alias("net_exact"),
            F.round(
                F.abs(
                    F.sum("net_double")
                    - F.sum(F.col("price") * (1 - F.col("disc"))).cast(
                        "double"
                    )
                ),
                4,
            ).alias("double_drift"),
        )
        .orderBy("l_returnflag")
    )
