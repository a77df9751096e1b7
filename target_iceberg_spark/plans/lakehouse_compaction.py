"""Small-file compaction planning (SURVEY.md §2A maintenance
extension, round 10).

The reference's TODO list stops at writing tables; operating an
Iceberg lakehouse means MAINTAINING them, and the every-day
maintenance job is compaction: group small data files into
target-sized rewrite bins per partition (Iceberg's own
RewriteDataFiles/binpack action — public API — plans exactly this
shape). The planner is pure relational work, so it belongs in the
query catalog: given a file inventory, emit the rewrite groups.

The inventory here is DERIVED deterministically from the orders table
(one simulated file per (month, priority) with bytes proportional to
row count) so the planner is oracle-checkable end-to-end; the real
writer's manifests would plug into the same plan unchanged.

Bin assignment is the cumulative-sum rule: within each partition,
files ordered largest-first, bin = floor((running_bytes - bytes) /
target) — the streaming one-pass equivalent of Iceberg's binpack
(never splits a file, fills ~target bytes per bin, off by at most one
file like all online bin packers).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ROW_BYTES = 150  # simulated bytes per row in the file inventory
TARGET_BYTES = 64_000  # compaction target size per rewrite bin


@register(
    "lakehouse_compaction_plan",
    oracle=f"""
WITH files AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS part,
           o_orderpriority AS file_id,
           CAST(COUNT(*) * {ROW_BYTES} AS BIGINT) AS bytes
    FROM orders GROUP BY 1, 2
),
planned AS (
    SELECT part, file_id, bytes,
           CAST(FLOOR((SUM(bytes) OVER (PARTITION BY part
                           ORDER BY bytes DESC, file_id) - bytes)
                      / {TARGET_BYTES}.0) AS BIGINT) AS bin
    FROM files
)
SELECT part, bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
       ROUND(SUM(bytes) / {TARGET_BYTES}.0, 4) AS fill_ratio
FROM planned
GROUP BY part, bin
ORDER BY part, bin
""",
    tags=("lakehouse", "maintenance", "compaction"),
)
def lakehouse_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition compaction plan over the simulated file
    inventory: files sorted largest-first inside each partition, the
    cumulative-byte rule assigns each to rewrite bin
    floor(preceding_bytes/{TARGET_BYTES}), and the output is one row
    per (partition, bin) with file count, bytes, and fill ratio —
    what an Iceberg RewriteDataFiles binpack pass would enqueue.

    Scale shape: the inventory is metadata, not data — one combinable
    groupBy collapses the fact table to (partition, file) rows; the
    bin rule is ONE window partitioned by the partition key (each
    partition's file list sorts independently — no global sort), and
    the summary is a second bounded groupBy. On a real catalog the
    files table comes straight from manifests and the full-data pass
    disappears entirely."""
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("part"),
        F.col("o_orderpriority").alias("file_id"),
    ).agg((F.count(F.lit(1)) * ROW_BYTES).cast("bigint").alias("bytes"))
    w = Window.partitionBy("part").orderBy(F.desc("bytes"), "file_id")
    planned = files.select(
        "part",
        "file_id",
        "bytes",
        F.floor((F.sum("bytes").over(w) - F.col("bytes")) / F.lit(float(TARGET_BYTES)))
        .cast("bigint")
        .alias("bin"),
    )
    return (
        planned.groupBy("part", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("bin_bytes"),
            F.round(F.sum("bytes") / F.lit(float(TARGET_BYTES)), 4).alias("fill_ratio"),
        )
        .orderBy("part", "bin")
    )
