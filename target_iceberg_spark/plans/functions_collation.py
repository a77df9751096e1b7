"""String collations (SURVEY.md §2B scalar-fn tier, round 8).

Spark 4.0 shipped COLLATE (SPARK-46830, public): per-expression
collation so case-/accent-insensitive comparison, grouping and
DISTINCT run inside codegen with collation-aware hashing — no
lower() rewrites sprinkled through the query, and (on real tables)
no loss of the original casing. This exercises the UTF8_LCASE
collation end-to-end: a deterministically case-mangled column is
DISTINCT-counted and equality-filtered under the collation, and the
oracle proves the semantics equal DuckDB's lower()-normalized
equivalents — the portable meaning of case-insensitivity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

COLL_PROBE = "MEDIUM"  # filter probe, deliberately upper-cased


@register(
    "fn_collation",
    oracle=f"""
WITH mangled AS (
    SELECT p_brand,
           CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
                ELSE p_type END AS t
    FROM part
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT t) AS BIGINT) AS n_binary_distinct,
       CAST(COUNT(DISTINCT lower(t)) AS BIGINT) AS n_ci_distinct,
       CAST(COUNT(*) FILTER (WHERE lower(t) = lower('{COLL_PROBE}'))
            AS BIGINT) AS n_probe_ci
FROM mangled
GROUP BY p_brand
ORDER BY p_brand
""",
    tags=("function", "string", "collation", "spark4"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive DISTINCT and equality via Spark 4 COLLATE:
    p_type is deterministically case-mangled (even part keys
    lowercased — the fixture's types arrive uppercase), then counted
    distinct under BINARY vs UTF8_LCASE
    collation and filtered against an upper-cased probe under the
    collation. The binary count sees every casing as distinct; the
    collated count restores the true type cardinality — and must
    equal the oracle's lower()-normalized semantics exactly.

    Scale shape: collation-aware hashing runs in the same combinable
    COUNT DISTINCT expand as any other distinct — no lower()
    projection materialized, no extra pass; the filter is a codegen
    collated comparison. One grouped aggregate total."""
    part = load_table(spark, sf_dir, "part")
    mangled = part.select(
        "p_brand",
        F.when(
            F.col("p_partkey") % 2 == 0, F.lower("p_type")
        ).otherwise(F.col("p_type")).alias("t"),
    )
    ci = F.expr("collate(t, 'UTF8_LCASE')")
    return (
        mangled.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("t").cast("bigint").alias("n_binary_distinct"),
            F.countDistinct(ci).cast("bigint").alias("n_ci_distinct"),
            F.count(
                F.when(ci == F.lit(COLL_PROBE), 1)
            ).cast("bigint").alias("n_probe_ci"),
        )
        .orderBy("p_brand")
    )
