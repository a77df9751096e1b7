"""Partition-spec evolution planner (SURVEY.md §2A maintenance
extension, round 12).

Iceberg evolves partition specs in metadata only (public spec:
partition evolution — new data writes under the new spec, existing
files keep the old one, scans split-plan per spec). Deciding WHETHER
to evolve — and whether to pay a rewrite so old files join the new
layout — is a planning question over the file inventory, the fourth
member of the maintenance tier beside compaction
(lakehouse_compaction_plan), snapshot GC (lakehouse_snapshot_gc) and
zone-map pruning (lakehouse_scan_prune).

Simulated current layout: one file per o_orderdate DAY (a day(ts)
spec — the classic over-partitioning at this volume: thousands of tiny
files). Proposed spec: month(ts). For a canned predicate set (week /
month / quarter ranges) the planner reports what each spec's partition
pruning would read — the day spec reads exactly the matching rows but
touches a file per day; the month spec collapses the file count (the
metadata/small-file win) at the cost of scan amplification for
sub-month predicates — plus the spec-level budget: file counts before/
after, small-file counts against the target file size, and the bytes a
full rewrite would move.

Determinism: everything derives from one per-day aggregate of orders
(calendar-bounded), file bytes are n_rows * {EVO_ROW_BYTES} (a stated
literal — the synthetic inventory has no physical files), and every
output is integer or a single rounded ratio.

Scale shape: ONE combinable corpus pass builds the per-day inventory;
it is localCheckpoint-ed at calendar-bounded size (~2.4k rows for 7
years) so the month rollup, the three predicate arms, and the totals
are all metadata-sized aggregates with one-row broadcast crosses. On a
real catalog the inventory comes straight from manifests and the data
pass disappears.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

EVO_ROW_BYTES = 120  # stated bytes/row for the synthetic inventory
EVO_TARGET_FILE_BYTES = 100_000  # small-file threshold (files under it)
# canned predicate arms: (name, lo, hi, month_lo, month_hi) — month
# bounds precomputed as literals so both engines prune months the same
EVO_ARMS = (
    ("1_week", "1996-03-01", "1996-03-07", "1996-03-01", "1996-03-01"),
    ("2_month", "1996-03-01", "1996-03-31", "1996-03-01", "1996-03-01"),
    ("3_quarter", "1996-01-01", "1996-03-31", "1996-01-01", "1996-03-01"),
)


def _arm_sql(name: str, lo: str, hi: str, mlo: str, mhi: str) -> str:
    return f"""
    SELECT '{name}' AS arm,
           CAST((SELECT SUM(n_rows) FROM days
                 WHERE day BETWEEN DATE '{lo}' AND DATE '{hi}')
                AS BIGINT) AS rows_match,
           CAST((SELECT COUNT(*) FROM days
                 WHERE day BETWEEN DATE '{lo}' AND DATE '{hi}')
                AS BIGINT) AS files_read_day,
           CAST((SELECT SUM(n_rows) FROM days
                 WHERE day BETWEEN DATE '{lo}' AND DATE '{hi}')
                AS BIGINT) AS rows_read_day,
           CAST((SELECT COUNT(*) FROM months
                 WHERE month BETWEEN DATE '{mlo}' AND DATE '{mhi}')
                AS BIGINT) AS files_read_month,
           CAST((SELECT SUM(n_rows) FROM months
                 WHERE month BETWEEN DATE '{mlo}' AND DATE '{mhi}')
                AS BIGINT) AS rows_read_month"""


@register(
    "lakehouse_partition_evolution",
    oracle=f"""
WITH days AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders GROUP BY 1, 2
),
months AS (
    SELECT month, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_day_files
    FROM days GROUP BY month
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS files_day_spec,
           CAST((SELECT COUNT(*) FROM months) AS BIGINT)
               AS files_month_spec,
           CAST(COUNT(*) FILTER (WHERE n_rows * {EVO_ROW_BYTES}
                                 < {EVO_TARGET_FILE_BYTES}) AS BIGINT)
               AS small_files_day,
           CAST((SELECT COUNT(*) FROM months
                 WHERE n_rows * {EVO_ROW_BYTES} < {EVO_TARGET_FILE_BYTES})
                AS BIGINT) AS small_files_month,
           CAST(SUM(n_rows) * {EVO_ROW_BYTES} AS BIGINT) AS rewrite_bytes
    FROM days
),
arms AS ({" UNION ALL ".join(_arm_sql(*a) for a in EVO_ARMS)})
SELECT a.arm, a.rows_match,
       a.files_read_day, a.rows_read_day,
       a.files_read_month, a.rows_read_month,
       ROUND(a.rows_read_day / CAST(GREATEST(a.rows_match, 1) AS DOUBLE), 4)
           AS amp_day,
       ROUND(a.rows_read_month / CAST(GREATEST(a.rows_match, 1) AS DOUBLE), 4)
           AS amp_month,
       CAST(a.files_read_day - a.files_read_month AS BIGINT)
           AS files_saved,
       t.files_day_spec, t.files_month_spec,
       t.small_files_day, t.small_files_month, t.rewrite_bytes
FROM arms a CROSS JOIN tot t
ORDER BY a.arm
""",
    tags=("lakehouse", "maintenance", "partitioning", "evolution"),
)
def lakehouse_partition_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Day->month partition-evolution plan: per predicate arm (week/
    month/quarter), the files and rows each spec's partition pruning
    reads, both amplification ratios, and the files saved; every row
    also carries the spec-level budget — file counts under each spec,
    small-file counts vs the {EVO_TARGET_FILE_BYTES}-byte target, and
    the full-rewrite byte volume.

    Scale shape: one combinable per-day corpus aggregate,
    localCheckpoint-ed at calendar-bounded size; the month rollup, the
    three arms and the totals are metadata-sized with one-row
    broadcast crosses."""
    orders = load_table(spark, sf_dir, "orders")
    days = (
        orders.groupBy(
            F.col("o_orderdate").cast("date").alias("day"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        # calendar-bounded inventory (~2.4k rows at any corpus size):
        # cut lineage so the month rollup, three arms and totals never
        # re-run the corpus pass
        .localCheckpoint()
    )
    months = days.groupBy("month").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_day_files"),
    )
    small = F.col("n_rows") * EVO_ROW_BYTES < EVO_TARGET_FILE_BYTES
    m_tot = months.agg(
        F.count(F.lit(1)).cast("bigint").alias("files_month_spec"),
        F.count(F.when(small, 1)).cast("bigint").alias("small_files_month"),
    )
    tot = (
        days.agg(
            F.count(F.lit(1)).cast("bigint").alias("files_day_spec"),
            F.count(F.when(small, 1)).cast("bigint").alias("small_files_day"),
            (F.sum("n_rows") * EVO_ROW_BYTES)
            .cast("bigint")
            .alias("rewrite_bytes"),
        )
        .crossJoin(F.broadcast(m_tot))
        .select(
            "files_day_spec",
            "files_month_spec",
            "small_files_day",
            "small_files_month",
            "rewrite_bytes",
        )
    )
    arm_frames = []
    for name, lo, hi, mlo, mhi in EVO_ARMS:
        in_day = F.col("day").between(F.lit(lo).cast("date"), F.lit(hi).cast("date"))
        day_row = days.agg(
            F.sum(F.when(in_day, F.col("n_rows"))).cast("bigint").alias("rows_match"),
            F.count(F.when(in_day, 1)).cast("bigint").alias("files_read_day"),
            F.sum(F.when(in_day, F.col("n_rows")))
            .cast("bigint")
            .alias("rows_read_day"),
        )
        in_month = F.col("month").between(
            F.lit(mlo).cast("date"), F.lit(mhi).cast("date")
        )
        month_row = months.agg(
            F.count(F.when(in_month, 1)).cast("bigint").alias("files_read_month"),
            F.sum(F.when(in_month, F.col("n_rows")))
            .cast("bigint")
            .alias("rows_read_month"),
        )
        arm_frames.append(
            day_row.crossJoin(F.broadcast(month_row)).select(
                F.lit(name).alias("arm"),
                "rows_match",
                "files_read_day",
                "rows_read_day",
                "files_read_month",
                "rows_read_month",
            )
        )
    arms = arm_frames[0]
    for f in arm_frames[1:]:
        arms = arms.unionAll(f)
    amp = lambda c: F.round(  # noqa: E731
        F.col(c) / F.greatest(F.col("rows_match"), F.lit(1)).cast("double"), 4
    )
    return (
        arms.crossJoin(F.broadcast(tot))
        .select(
            "arm",
            "rows_match",
            "files_read_day",
            "rows_read_day",
            "files_read_month",
            "rows_read_month",
            amp("rows_read_day").alias("amp_day"),
            amp("rows_read_month").alias("amp_month"),
            (F.col("files_read_day") - F.col("files_read_month"))
            .cast("bigint")
            .alias("files_saved"),
            "files_day_spec",
            "files_month_spec",
            "small_files_day",
            "small_files_month",
            "rewrite_bytes",
        )
        .orderBy("arm")
    )
