"""Bucketed-layout co-located join as a first-class query
(SURVEY.md §2B joins family).

`tests/test_bucketing.py` proves the mechanics; this module makes the
zero-shuffle fact-fact join a REGISTERED capability: both join sides
are materialized ONCE as bucketed+sorted external tables (content-
keyed cache, same discipline as the jsonl/csv/orc derived sources),
re-registered in the session catalog over their files, and every
subsequent join on the bucket key sort-merges with NO Exchange on
either side. At 100 TB this is the difference between re-shuffling
two fact tables on every join and never shuffling them again — the
layout is written once at ingest (`writer.py` supports sorted
clustered writes) and amortized over every downstream query.
"""

from __future__ import annotations

import os
import re
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.scans import _derived_source
from target_iceberg_spark.sources.tables import load_table

N_BUCKETS = 8


def bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key: str
) -> DataFrame:
    """Session-catalog DataFrame over a bucketed+sorted external copy
    of ``table``, derived once per testdata generation.

    Files go through `_derived_source`'s content-keyed cache (per-
    process tmp staging, atomic publish, stale-generation sweep); the
    catalog entry is re-created over the published location with the
    bucket spec, so Spark's scan carries outputPartitioning =
    HashPartitioning(key, N) and the sort-merge join consumes it
    instead of planning an Exchange. (Spark still inserts the
    within-partition Sort — it does not trust SORTED BY file order on
    read — but that sort is per-bucket over already-ordered runs and
    never shuffles; the Exchange is the cost that matters at scale.)"""
    schema = load_table(spark, sf_dir, table).schema

    def write(df: DataFrame, tmp: str) -> None:
        # saveAsTable is the only writer that emits bucket metadata in
        # the file names; the throwaway catalog entry is dropped right
        # after, leaving pure bucketed files for the atomic publish.
        tmp_name = f"tmp_bucket_{uuid.uuid4().hex[:8]}"
        (
            df.write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", tmp)
            .mode("overwrite")
            .saveAsTable(tmp_name)
        )
        spark.sql(f"DROP TABLE `{tmp_name}`")

    src = _derived_source(spark, sf_dir, table, "bkt", write)
    fp = re.search(r"_([0-9a-f]{16})\.bkt$", os.path.basename(src)).group(1)
    name = f"b_{table}_{fp}"
    if not spark.catalog.tableExists(name):
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS `{name}` ({cols}) USING PARQUET "
            f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) "
            f"INTO {N_BUCKETS} BUCKETS LOCATION '{src}'"
        )
    return spark.table(name)


@register(
    "join_bucketed",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    tags=("join", "bucketed", "layout"),
    bench=False,  # first run pays the one-time bucketed-table write
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join on pre-bucketed layout: orders and lineitem are
    both bucketed on the order key, so the sort-merge join consumes
    the files' own partitioning — ZERO Exchange on either side
    (plan-asserted in tests/test_plans.py; Spark still plans the
    within-partition Sort since it distrusts file order on read, but
    that is a per-bucket in-memory pass, not a shuffle). The oracle is
    the plain logical join: layout changes the plan, not the answer.

    The merge hint pins SMJ because at test SF the optimizer would
    rather broadcast the small side — at 100 TB neither fact side
    broadcasts and SMJ-over-buckets IS the plan; the hint makes the
    test exercise exactly the plan the layout exists for. The derived
    bucketed copies are content-keyed cache artifacts built once per
    testdata generation (first run pays the write; every later join
    reads co-located)."""
    o = bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    li = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    return (
        o.hint("merge")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
