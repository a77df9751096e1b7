"""Lakehouse scan-layer plans (SURVEY.md §2B, round 5): dynamic
partition pruning, schema-evolution reads, and VARIANT semi-structured
access.

The reference is write-only (it CREATES Iceberg tables; SURVEY.md §2
Part B) — these queries are the read-side of the same lakehouse
features its output tables rely on: partition layouts that prune,
schemas that evolve additively (the reference leaves evolution as a
TODO, reference sinks.py:92), and semi-structured payload columns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.scans import (
    _derived_orders_partitioned,
    _derived_source,
)
from target_iceberg_spark.sources.tables import load_table


@register(
    "scan_dpp",
    oracle="""
WITH dim AS (
    SELECT DISTINCT CAST(year(l_shipdate) AS INT) AS yr
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-06-01'
)
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN dim ON year(o_orderdate) = yr
GROUP BY o_year
ORDER BY o_year
""",
    tags=("scan", "partition", "dpp"),
    bench=False,
)
def scan_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the years to scan are not a literal
    in the query (that would be static pruning, scan_partitioned's
    case) — they are computed at runtime from another table (the
    distinct years lineitem still shipped in after a cutoff). Spark
    broadcasts
    the dim side and injects its year set into the fact scan's
    PartitionFilters as a `dynamicpruning` subquery, so the
    hive-partitioned orders copy never lists the other years'
    directories (plan-asserted in tests/test_plans.py).

    At 100 TB this is the star-schema workhorse: `fact JOIN dim WHERE
    dim.attr = ...` prunes the fact scan by values only known after
    filtering the dim — without DPP the fact side is a full scan no
    static optimizer can avoid. The oracle computes the identical join
    against the unpartitioned logical table. Excluded from bench
    (one-time fixture materialization)."""
    src = _derived_orders_partitioned(spark, sf_dir)
    fact = spark.read.parquet(src)
    dim = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp_ntz"))
        .select(F.year("l_shipdate").alias("yr"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), fact["o_year"] == dim["yr"])
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_year")
    )


def _derived_orders_evolved(spark: SparkSession, sf_dir: str) -> str:
    """Two-generation parquet layout of orders: `ver=1/` files carry
    the original 3-column schema, `ver=2/` files the evolved 4-column
    one (o_orderpriority added). Even order keys shipped under v1, odd
    under v2 — deterministic, so the oracle can reconstruct which rows
    carry the new column."""

    def write(df: DataFrame, tmp: str) -> None:
        base = df.select("o_orderkey", "o_custkey", "o_totalprice")
        old = base.where(F.col("o_orderkey") % 2 == 0)
        new = df.select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        ).where(F.col("o_orderkey") % 2 == 1)
        old.write.mode("overwrite").parquet(f"{tmp}/ver=1")
        new.write.mode("overwrite").parquet(f"{tmp}/ver=2")

    return _derived_source(spark, sf_dir, "orders", "evo", write)


@register(
    "scan_merge_schema",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority,
       CAST(1 + o_orderkey % 2 AS INT) AS ver
FROM orders
""",
    tags=("scan", "schema-evolution"),
    bench=False,
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution READ: one logical table whose parquet files
    span two schema generations (a column added mid-stream — the exact
    situation the writer's additive evolution, reference sinks.py:92
    TODO, produces). `mergeSchema=true` unions the file footers'
    schemas; old-generation rows surface the new column as NULL, and
    partition discovery exposes the generation (`ver`) directory as a
    column.

    Scale note: schema merge reads FOOTERS, not data — cost is
    O(files), and the per-file projection still prunes columns that
    file actually has. The oracle reconstructs the same frame from the
    logical table using the deterministic even/odd generation split.
    Excluded from bench (one-time fixture materialization)."""
    src = _derived_orders_evolved(spark, sf_dir)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(src)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderpriority",
            F.col("ver").cast("int").alias("ver"),
        )
    )


@register(
    "fn_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       json_extract_string(props, '$.k') AS k_str,
       CAST(NULL AS INT) AS missing_k,
       event_type AS et_roundtrip,
       ROUND(value, 6) AS value_roundtrip
FROM events
""",
    tags=("function", "variant", "json"),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT access over semi-structured payloads:
    `parse_json` turns the events.props JSON string into the binary
    VARIANT encoding once, then `variant_get` extracts typed fields
    without re-parsing per extraction (the classic JSON-string
    anti-pattern this type exists to kill), `try_variant_get` returns
    NULL for absent paths instead of erroring, and a
    to_json -> parse_json round trip must preserve native column
    values bit-for-bit.

    Scale note: VARIANT parses each payload ONCE into a columnar
    binary form shredded at scan time; N extractions on a JSON string
    cost N parses, on a VARIANT they cost N binary lookups — at 100 TB
    of event payloads that is the difference between CPU-bound and
    IO-bound scans. The oracle reads the same fields with DuckDB's
    JSON extractors (and the round-trip columns straight from the
    native columns, which is exactly the round-trip claim)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    j = F.parse_json(F.to_json(F.struct("event_type", "value")))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_k"),
        F.try_variant_get(j, "$.event_type", "string").alias("et_roundtrip"),
        F.round(F.try_variant_get(j, "$.value", "double"), 6).alias(
            "value_roundtrip"
        ),
    )
