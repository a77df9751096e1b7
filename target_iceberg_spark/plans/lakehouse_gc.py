"""Snapshot-expiry / orphan-file GC planning (SURVEY.md §2A
maintenance extension, round 11).

lakehouse_compaction_plan (plans/lakehouse_compaction.py) plans the
rewrite job; the OTHER every-day Iceberg maintenance job is
expire_snapshots + remove_orphan_files (Iceberg spec + maintenance
docs, public API): pick the snapshots to drop under a
retain-last-N + max-age policy, then reclaim the files no retained
snapshot references.

The inventory is DERIVED deterministically so the planner is
oracle-checkable end-to-end:
  - one snapshot per o_orderdate month (the table's commit history),
  - one data file per (month, priority), bytes = rows x ROW_BYTES,
    added in its month's snapshot and logically deleted L months later
    (L = 1 + first-priority-digit mod 3 — a rewrite/retention mix), so
    a file is referenced by snapshots [added, added+L).

Because both policy arms (last-N, max-age) keep a SUFFIX of the
history, the kept set is month >= oldest_kept and a file is
reclaimable exactly when its last referencing snapshot predates
oldest_kept — the orphan rule collapses to one integer comparison.
All arithmetic is integer month indexes and byte counts: no doubles,
no rounding, bit-identical across engines by construction.

Scale shape: pure metadata — the only corpus-sized stage is the one
combinable groupBy building the file inventory (on a real catalog this
comes straight from manifests and disappears); snapshots are a
distinct-months aggregate, the age rank is one window over that
aggregate-bounded table (structurally provable by the bounded-window
plan assertion), and the file-to-snapshot attribution is a broadcast
equi-join between two metadata tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

GC_ROW_BYTES = 150  # simulated bytes per row (same as compaction plan)
GC_RETAIN_LAST = 6  # expire_snapshots retain-last floor
GC_MAX_AGE_MONTHS = 12  # keep snapshots at most this many months old


@register(
    "lakehouse_snapshot_gc",
    oracle=f"""
WITH snaps AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS snap_month,
           CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS BIGINT)
               AS m_idx
    FROM orders GROUP BY 1, 2
),
ranked AS (
    SELECT snap_month, m_idx,
           CAST(ROW_NUMBER() OVER (ORDER BY m_idx DESC) AS BIGINT)
               AS age_rank
    FROM snaps
),
bounds AS (
    SELECT MAX(m_idx) AS newest,
           MIN(CASE WHEN age_rank <= {GC_RETAIN_LAST}
                     OR m_idx > (SELECT MAX(m_idx) FROM ranked)
                               - {GC_MAX_AGE_MONTHS}
                    THEN m_idx END) AS oldest_kept
    FROM ranked
),
files AS (
    SELECT CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS BIGINT)
               AS added_idx,
           o_orderpriority AS file_id,
           CAST(COUNT(*) * {GC_ROW_BYTES} AS BIGINT) AS bytes,
           CAST(1 + CAST(substr(o_orderpriority, 1, 1) AS BIGINT) % 3
                AS BIGINT) AS lifetime
    FROM orders GROUP BY 1, 2
),
attributed AS (
    SELECT LEAST(f.added_idx + f.lifetime - 1, b.newest) AS last_ref_idx,
           f.bytes
    FROM files f CROSS JOIN bounds b
),
per_snap AS (
    SELECT last_ref_idx,
           CAST(COUNT(*) AS BIGINT) AS n_files_last_ref,
           CAST(SUM(bytes) AS BIGINT) AS last_ref_bytes
    FROM attributed GROUP BY last_ref_idx
)
SELECT r.snap_month,
       r.age_rank,
       CASE WHEN r.m_idx >= b.oldest_kept THEN 'keep'
            ELSE 'expire' END AS action,
       COALESCE(p.n_files_last_ref, 0) AS n_files_last_ref,
       COALESCE(p.last_ref_bytes, 0) AS last_ref_bytes,
       CASE WHEN r.m_idx < b.oldest_kept
            THEN COALESCE(p.last_ref_bytes, 0) ELSE 0 END
           AS reclaimable_bytes
FROM ranked r
CROSS JOIN bounds b
LEFT JOIN per_snap p ON p.last_ref_idx = r.m_idx
ORDER BY r.snap_month
""",
    tags=("lakehouse", "maintenance", "gc", "snapshots"),
)
def lakehouse_snapshot_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expire-snapshots + orphan-file plan over the simulated commit
    history: one row per snapshot with its age rank, keep/expire
    decision under retain-last-{GC_RETAIN_LAST} + max-age
    {GC_MAX_AGE_MONTHS} months, the files whose LAST reference is that
    snapshot, and the bytes reclaimed if it (and everything older)
    expires — what Iceberg's expire_snapshots / remove_orphan_files
    pair would enqueue.

    Scale shape: metadata-only after one combinable inventory groupBy;
    the age rank is a window over the distinct-months aggregate
    (bounded by calendar span), file attribution is a broadcast
    equi-join of two metadata tables, and every value is an integer —
    no cross-engine rounding surface at all."""
    orders = load_table(spark, sf_dir, "orders")
    m_idx = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ).cast("bigint")
    snaps = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
            "snap_month"
        ),
        m_idx.alias("m_idx"),
    ).agg(F.count(F.lit(1)).alias("_n")).drop("_n")
    ranked = snaps.select(
        "snap_month",
        "m_idx",
        F.row_number()
        .over(Window.orderBy(F.desc("m_idx")))
        .cast("bigint")
        .alias("age_rank"),
    )
    newest = ranked.agg(F.max("m_idx").alias("newest"))
    bounds = (
        ranked.crossJoin(F.broadcast(newest))
        .agg(
            F.max("newest").alias("newest"),
            F.min(
                F.when(
                    (F.col("age_rank") <= GC_RETAIN_LAST)
                    | (
                        F.col("m_idx")
                        > F.col("newest") - GC_MAX_AGE_MONTHS
                    ),
                    F.col("m_idx"),
                )
            ).alias("oldest_kept"),
        )
    )
    files = (
        orders.groupBy(
            m_idx.alias("added_idx"),
            F.col("o_orderpriority").alias("file_id"),
        )
        .agg((F.count(F.lit(1)) * GC_ROW_BYTES).cast("bigint").alias("bytes"))
        .select(
            "added_idx",
            "bytes",
            (1 + F.substring("file_id", 1, 1).cast("bigint") % 3)
            .cast("bigint")
            .alias("lifetime"),
        )
    )
    attributed = files.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.col("added_idx") + F.col("lifetime") - 1, F.col("newest")
        ).alias("last_ref_idx"),
        "bytes",
    )
    per_snap = attributed.groupBy("last_ref_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files_last_ref"),
        F.sum("bytes").cast("bigint").alias("last_ref_bytes"),
    )
    return (
        ranked.crossJoin(F.broadcast(bounds))
        .join(
            F.broadcast(per_snap),
            F.col("last_ref_idx") == F.col("m_idx"),
            "left",
        )
        .select(
            "snap_month",
            "age_rank",
            F.when(F.col("m_idx") >= F.col("oldest_kept"), "keep")
            .otherwise("expire")
            .alias("action"),
            F.coalesce("n_files_last_ref", F.lit(0)).alias(
                "n_files_last_ref"
            ),
            F.coalesce("last_ref_bytes", F.lit(0)).alias("last_ref_bytes"),
            F.when(
                F.col("m_idx") < F.col("oldest_kept"),
                F.coalesce("last_ref_bytes", F.lit(0)),
            )
            .otherwise(F.lit(0))
            .alias("reclaimable_bytes"),
        )
        .orderBy("snap_month")
    )
