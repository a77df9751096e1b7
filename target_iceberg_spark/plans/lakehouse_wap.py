"""Write-Audit-Publish gate (SURVEY.md §2A maintenance extension,
round 12).

The lakehouse maintenance tier plans rewrites (lakehouse_compaction),
expiry (lakehouse_snapshot_gc), skipping (lakehouse_scan_prune) and
spec changes (lakehouse_partition_evolution); the remaining every-day
Iceberg workflow is the WAP pattern (Iceberg docs / Netflix's
branch-audit-publish practice, public): write a staged snapshot,
AUDIT it against the published table, and only then fast-forward the
publish branch. profile_expectations is the static single-table
contract; this is the CROSS-SNAPSHOT gate — every check compares the
staged batch to the published history:

    row_count_drift  staged rows vs trailing-3-CALENDAR-month mean
                     (volume regression / double-load detector; a
                     published month with NO rows counts as zero and
                     drags the baseline down — an outage month must
                     move the baseline, not silently shift the
                     window to older months)
    invalid_values   null or non-positive totals, null keys (both
                     null arms explicit: NULL <= 0 is NULL, so a
                     bare comparison would silently pass corrupt
                     rows)
    duplicate_keys   staged keys already published + intra-batch dups
                     (replay / at-least-once duplication detector)
    status_novelty   staged status values never seen published
                     (schema-drift / upstream enum-change detector)
    publish          the verdict row: number of failed checks

The staged batch is the newest o_orderdate month of `orders` — the
partition an ingest job would have just written; everything earlier is
the published table.

Scale shape: the staged batch is a partition-pruned scan (one month;
on a real table the WAP branch's own files); published-side stats are
combinable aggregates (per-month counts, distinct statuses — both
calendar/enum-bounded). The ONE corpus-sized join is the key-overlap
check, a semi-join of the staged keys against published keys
(bloom-gatable, bucketable); the verdict derives from the
localCheckpoint-ed 4-row check table, so re-reading it for the
publish row re-runs nothing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.rounding import (
    portable_round,
    portable_round_sql,
)
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

WAP_DRIFT_HI = 2.0  # staged/trailing-mean ratio ceiling
WAP_DRIFT_LO = 0.5  # ... and floor
WAP_TRAIL_MONTHS = 3  # trailing window for the volume baseline


@register(
    "lakehouse_wap_audit",
    oracle=f"""
WITH o AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS BIGINT)
               AS midx
    FROM orders
),
mx AS (SELECT MAX(midx) AS mx FROM o),
staged AS (SELECT o.* FROM o CROSS JOIN mx WHERE o.midx = mx.mx),
pub AS (SELECT o.* FROM o CROSS JOIN mx WHERE o.midx < mx.mx),
trail AS (
    SELECT COUNT(*) / CAST({WAP_TRAIL_MONTHS} AS DOUBLE) AS avg3
    FROM pub CROSS JOIN mx
    WHERE pub.midx >= mx.mx - {WAP_TRAIL_MONTHS}
),
c_drift AS (
    SELECT 'row_count_drift' AS check_name,
           {portable_round_sql(
               "(SELECT CAST(COUNT(*) AS DOUBLE) FROM staged) / avg3", 6)}
               AS observed,
           {WAP_DRIFT_HI!r} AS bound,
           (SELECT CAST(COUNT(*) AS DOUBLE) FROM staged) / avg3
               BETWEEN {WAP_DRIFT_LO!r} AND {WAP_DRIFT_HI!r} AS ok
    FROM trail
),
c_invalid AS (
    SELECT 'invalid_values' AS check_name,
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                           OR o_custkey IS NULL OR o_orderkey IS NULL
                         THEN 1 ELSE 0 END) AS DOUBLE) AS observed,
           0.0 AS bound,
           SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                      OR o_custkey IS NULL OR o_orderkey IS NULL
                    THEN 1 ELSE 0 END) = 0 AS ok
    FROM staged
),
c_dup AS (
    SELECT 'duplicate_keys' AS check_name,
           CAST((SELECT COUNT(*) FROM staged s
                 WHERE EXISTS (SELECT 1 FROM pub p
                               WHERE p.o_orderkey = s.o_orderkey))
                + (SELECT COALESCE(SUM(cnt), 0)
                   FROM (SELECT COUNT(*) AS cnt FROM staged
                         GROUP BY o_orderkey HAVING COUNT(*) > 1))
                AS DOUBLE) AS observed,
           0.0 AS bound,
           CAST((SELECT COUNT(*) FROM staged s
                 WHERE EXISTS (SELECT 1 FROM pub p
                               WHERE p.o_orderkey = s.o_orderkey))
                + (SELECT COALESCE(SUM(cnt), 0)
                   FROM (SELECT COUNT(*) AS cnt FROM staged
                         GROUP BY o_orderkey HAVING COUNT(*) > 1))
                AS DOUBLE) = 0 AS ok
),
c_novel AS (
    SELECT 'status_novelty' AS check_name,
           CAST(COUNT(*) AS DOUBLE) AS observed,
           0.0 AS bound,
           COUNT(*) = 0 AS ok
    FROM (SELECT DISTINCT o_orderstatus FROM staged) s
    WHERE NOT EXISTS (SELECT 1 FROM pub p
                      WHERE p.o_orderstatus = s.o_orderstatus)
),
checks AS (
    SELECT * FROM c_drift UNION ALL SELECT * FROM c_invalid
    UNION ALL SELECT * FROM c_dup UNION ALL SELECT * FROM c_novel
)
SELECT check_name, observed, bound, ok FROM checks
UNION ALL
SELECT 'publish' AS check_name,
       CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS DOUBLE) AS observed,
       0.0 AS bound,
       SUM(CASE WHEN ok THEN 0 ELSE 1 END) = 0 AS ok
FROM checks
ORDER BY check_name
""",
    tags=("lakehouse", "wap", "audit", "quality-gate"),
)
def lakehouse_wap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAP audit of the newest o_orderdate month as a staged snapshot
    against the published history: volume drift vs the trailing
    {WAP_TRAIL_MONTHS}-month mean (ratio in [{WAP_DRIFT_LO},
    {WAP_DRIFT_HI}]), invalid values, duplicate keys (cross-snapshot
    replay + intra-batch), status-domain novelty — and the publish
    verdict row counting failed checks.

    Scale shape: staged = partition-pruned newest-month scan; the only
    corpus-sized join is the staged-vs-published key semi-join; every
    other published-side input is a combinable calendar- or
    enum-bounded aggregate; the publish verdict re-reads the
    localCheckpoint-ed 4-row check table, not the pipeline."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("midx"),
    )
    mx = o.agg(F.max("midx").alias("mx"))
    staged = o.crossJoin(F.broadcast(mx)).where(F.col("midx") == F.col("mx"))
    pub = o.crossJoin(F.broadcast(mx)).where(F.col("midx") < F.col("mx"))

    trail = pub.where(
        F.col("midx") >= F.col("mx") - WAP_TRAIL_MONTHS
    ).agg(
        (F.count(F.lit(1)) / F.lit(float(WAP_TRAIL_MONTHS))).alias("avg3")
    )
    staged_n = staged.agg(F.count(F.lit(1)).cast("double").alias("sn"))
    ratio = F.col("sn") / F.col("avg3")
    c_drift = (
        staged_n.crossJoin(F.broadcast(trail))
        .select(
            F.lit("row_count_drift").alias("check_name"),
            # count ratio = small-denominator rational -> the portable
            # FLOOR form, not ROUND (functions/rounding.py)
            portable_round(ratio, 6).alias("observed"),
            F.lit(WAP_DRIFT_HI).alias("bound"),
            ratio.between(WAP_DRIFT_LO, WAP_DRIFT_HI).alias("ok"),
        )
    )
    invalid = F.sum(
        F.when(
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") <= 0)
            | F.col("o_custkey").isNull()
            | F.col("o_orderkey").isNull(),
            1,
        ).otherwise(0)
    )
    c_invalid = staged.agg(
        F.lit("invalid_values").alias("check_name"),
        invalid.cast("double").alias("observed"),
        F.lit(0.0).alias("bound"),
        (invalid == 0).alias("ok"),
    )
    cross_dups = staged.join(pub, "o_orderkey", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    intra_dups = (
        staged.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("i"))
    )
    dup_total = (F.col("x") + F.col("i")).cast("double")
    c_dup = cross_dups.crossJoin(F.broadcast(intra_dups)).select(
        F.lit("duplicate_keys").alias("check_name"),
        dup_total.alias("observed"),
        F.lit(0.0).alias("bound"),
        (dup_total == 0).alias("ok"),
    )
    novel = (
        staged.select("o_orderstatus")
        .distinct()
        .join(
            F.broadcast(pub.select("o_orderstatus").distinct()),
            "o_orderstatus",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("nv"))
        .select(
            F.lit("status_novelty").alias("check_name"),
            F.col("nv").cast("double").alias("observed"),
            F.lit(0.0).alias("bound"),
            (F.col("nv") == 0).alias("ok"),
        )
    )
    checks = (
        c_drift.unionAll(c_invalid).unionAll(c_dup).unionAll(novel)
    ).localCheckpoint()
    failed = F.sum(F.when(F.col("ok"), 0).otherwise(1))
    publish = checks.agg(
        F.lit("publish").alias("check_name"),
        failed.cast("double").alias("observed"),
        F.lit(0.0).alias("bound"),
        (failed == 0).alias("ok"),
    )
    return checks.unionAll(publish).orderBy("check_name")
