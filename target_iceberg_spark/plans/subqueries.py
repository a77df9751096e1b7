"""Correlated EXISTS/IN subqueries through the SQL front door
(SURVEY.md §2B subquery family; sibling of subquery_scalar).

Catalyst decorrelates NOT EXISTS into a left-anti join and IN into a
left-semi join — one shuffle each, no per-row re-execution — which is
the property that makes SQL-authored subqueries safe at 100 TB. The
plan-shape contract (anti/semi, no nested-loop) is asserted in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SUBQUERY_EXISTS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > 5000
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1997-01-01'
  )
"""

SUBQUERY_IN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    WHERE l_returnflag = 'R' AND l_discount >= 0.09
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("subquery_exists", oracle=SUBQUERY_EXISTS_SQL, tags=("subquery", "sql"))
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (high-balance customers with no recent
    orders) — decorrelated by Catalyst into a left-anti join."""
    for name in ("customer", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(SUBQUERY_EXISTS_SQL)


@register("subquery_in", oracle=SUBQUERY_IN_SQL, tags=("subquery", "sql"))
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery on the fact table (TPC-H Q4 shape: orders with at
    least one deeply-discounted returned lineitem — the testdata
    lineitem has no receipt/commit dates) — decorrelated into a
    left-semi join."""
    for name in ("orders", "lineitem"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(SUBQUERY_IN_SQL)


SUBQUERY_NOT_IN_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey NOT IN (
    SELECT c_nationkey FROM customer WHERE c_acctbal < -900
)
"""


@register("subquery_not_in", oracle=SUBQUERY_NOT_IN_SQL, tags=("subquery", "sql"))
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with its full three-valued-logic semantics (any NULL in
    the subquery result empties the output; NULL probe rows never
    qualify) — Spark plans a null-aware anti join, which degenerates to
    a broadcast when the subquery side is small. At scale prefer NOT
    EXISTS (subquery_exists) unless NULL semantics are actually wanted;
    keeping both queries makes that trade visible."""
    for name in ("supplier", "customer"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(SUBQUERY_NOT_IN_SQL)
