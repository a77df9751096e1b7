"""Incremental aggregate maintenance from a CDC changelog
(SURVEY.md §2B engine extension, round 12).

cdc_snapshot_diff classifies ROW changes between two table versions;
the production follow-up is keeping a MATERIALIZED AGGREGATE current
without rescanning the base table — classic incremental view
maintenance (Gupta & Mumick, "Maintenance of Materialized Views:
Problems, Techniques, and Applications", IEEE Data Eng. Bull. 1995 —
public; the delta-processing model of every streaming SQL engine).
COUNT/SUM views are self-maintainable: apply signed deltas

    insert  -> (+1, +cents)
    delete  -> (-1, -cents)
    update  -> (-1, -old_cents) + (+1, +new_cents)

to the stored per-group (count, sum) pairs and drop groups whose
count reaches zero. This query maintains the per-customer order MV
under the SAME deterministic v1->v2 changelog cdc_snapshot_diff uses
(keys %97 deleted, %89 repriced +10%, %83 re-inserted under shifted
ids), then VERIFIES the maintained MV against a full recompute from
v2 — the audit emits one exact-integer summary row, so any algebra
drift is a hash failure, not a silent skew.

Money is summed in BIGINT cents (the agg_decimal_ledger discipline)
so every comparison is exact, never float-noise. Cents use the
portable FLOOR(x + 0.5) form, NOT ROUND: the repriced total lands
exactly on a half-cent for some inputs (e.g. 292701.85 * 1.1 =
321972.035) and Spark's HALF_UP-on-decimal-repr rounds UP where
DuckDB's std::round on the binary double (321972.03499999...) rounds
DOWN — floor of the identical IEEE product is bit-stable on both
engines (the events_rfm discipline).

Scale shape: the incremental path touches only changelog-sized and
MV-sized data — one combinable groupBy over the changelog (three
union'd filter branches of the base scan here; a real pipeline reads
the changelog directly) and one key-partitioned full-outer join
against the stored MV. The full recompute exists to be audited
against (in production you'd sample it); it is one combinable
groupBy. Final answer is a handful of 1-row aggregates unioned —
nothing collected, no windows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
_NEW_CENTS = "CAST(FLOOR(o_totalprice * 1.1 * 100 + 0.5) AS BIGINT)"


@register(
    "cdc_incremental_agg",
    oracle=f"""
WITH base AS (
    SELECT o_orderkey, o_custkey, {_CENTS} AS cents FROM orders
),
mv0 AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(cents) AS BIGINT) AS s
    FROM base GROUP BY o_custkey
),
changelog AS (
    SELECT o_custkey, -1 AS dc, -cents AS ds
    FROM base WHERE o_orderkey % 97 = 0
    UNION ALL
    SELECT o_custkey, -1 AS dc, -{_CENTS} AS ds
    FROM orders WHERE o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_custkey, 1 AS dc, {_NEW_CENTS} AS ds
    FROM orders WHERE o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_custkey, 1 AS dc, {_CENTS} AS ds
    FROM orders WHERE o_orderkey % 83 = 0
),
delta AS (
    SELECT o_custkey, CAST(SUM(dc) AS BIGINT) AS dc,
           CAST(SUM(ds) AS BIGINT) AS ds
    FROM changelog GROUP BY o_custkey
),
mv1_inc AS (
    SELECT COALESCE(m.o_custkey, d.o_custkey) AS o_custkey,
           COALESCE(m.c, 0) + COALESCE(d.dc, 0) AS c,
           COALESCE(m.s, 0) + COALESCE(d.ds, 0) AS s
    FROM mv0 m FULL OUTER JOIN delta d ON m.o_custkey = d.o_custkey
),
mv1_live AS (SELECT * FROM mv1_inc WHERE c > 0),
v2 AS (
    SELECT o_custkey,
           CASE WHEN o_orderkey % 89 = 0 THEN {_NEW_CENTS}
                ELSE {_CENTS} END AS cents
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_custkey, {_CENTS} AS cents
    FROM orders WHERE o_orderkey % 83 = 0
),
mv1_full AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(cents) AS BIGINT) AS s
    FROM v2 GROUP BY o_custkey
),
audit AS (
    SELECT COALESCE(i.o_custkey, f.o_custkey) AS o_custkey,
           i.c AS ic, i.s AS isum, f.c AS fc, f.s AS fsum
    FROM mv1_live i FULL OUTER JOIN mv1_full f
      ON i.o_custkey = f.o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN ic IS NULL OR fc IS NULL
                      OR ic <> fc OR isum <> fsum
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM delta) AS groups_with_delta,
       (SELECT CAST(SUM(c) AS BIGINT) FROM mv1_live) AS rows_after,
       (SELECT CAST(SUM(s) AS BIGINT) FROM mv1_live) AS cents_after,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM mv1_inc WHERE c = 0)
           AS groups_retired
FROM audit
""",
    tags=("cdc", "ivm", "materialized-view", "audit"),
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row exact-integer audit of incremental view maintenance:
    the per-customer (order count, cents total) MV is advanced with
    signed changelog deltas (delete/update/insert derived by
    cdc_snapshot_diff's deterministic v1->v2 rules) and compared
    group-by-group against a full recompute from v2 — n_mismatch must
    be 0, plus the delta fan-out, surviving row/cents totals, and the
    count of groups retired by the deltas.

    Scale shape: incremental path = changelog groupBy + one
    key-partitioned full-outer join against the MV (both sides
    MV/changelog-sized, never base-table-sized on a real changelog);
    verification recompute is one combinable groupBy; the summary is
    broadcast-joined 1-row aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    new_cents = F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5).cast("bigint")
    base = orders.select("o_orderkey", "o_custkey", cents.alias("cents"))
    mv0 = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    k = F.col("o_orderkey")
    deleted = base.where(k % 97 == 0).select(
        "o_custkey", F.lit(-1).alias("dc"), (-F.col("cents")).alias("ds")
    )
    upd = orders.where((k % 89 == 0) & (k % 97 != 0))
    upd_out = upd.select("o_custkey", F.lit(-1).alias("dc"), (-cents).alias("ds"))
    upd_in = upd.select("o_custkey", F.lit(1).alias("dc"), new_cents.alias("ds"))
    ins = orders.where(k % 83 == 0).select(
        "o_custkey", F.lit(1).alias("dc"), cents.alias("ds")
    )
    changelog = deleted.unionAll(upd_out).unionAll(upd_in).unionAll(ins)
    # localCheckpoint: `delta` (changelog-group-sized) feeds the MV join
    # AND the groups_with_delta count; without the cut each consumer
    # re-ran the 4-branch changelog scan+groupBy (round-13 plan audit:
    # 42 parquet scans in one query).
    delta = changelog.groupBy("o_custkey").agg(
        F.sum("dc").cast("bigint").alias("dc"),
        F.sum("ds").cast("bigint").alias("ds"),
    ).localCheckpoint()
    m, d = mv0.alias("m"), delta.alias("d")
    mv1_inc = m.join(
        d, F.col("m.o_custkey") == F.col("d.o_custkey"), "full_outer"
    ).select(
        F.coalesce("m.o_custkey", "d.o_custkey").alias("o_custkey"),
        (F.coalesce("m.c", F.lit(0)) + F.coalesce("d.dc", F.lit(0))).alias("c"),
        (F.coalesce("m.s", F.lit(0)) + F.coalesce("d.ds", F.lit(0))).alias("s"),
    ).localCheckpoint()
    # localCheckpoint: `mv1_inc` (MV-sized) has FOUR consumers (audit
    # join, rows_after/cents_after rollup, groups_retired count, via
    # mv1_live twice) — each re-ran the mv0 corpus groupBy + MV join.
    mv1_live = mv1_inc.where(F.col("c") > 0)
    v2 = (
        orders.where(k % 97 != 0)
        .select(
            "o_custkey",
            F.when(k % 89 == 0, new_cents).otherwise(cents).alias("cents"),
        )
        .unionAll(orders.where(k % 83 == 0).select("o_custkey", cents.alias("cents")))
    )
    mv1_full = v2.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    i, f = mv1_live.alias("i"), mv1_full.alias("f")
    audit = i.join(
        f, F.col("i.o_custkey") == F.col("f.o_custkey"), "full_outer"
    ).select(
        F.col("i.c").alias("ic"),
        F.col("i.s").alias("isum"),
        F.col("f.c").alias("fc"),
        F.col("f.s").alias("fsum"),
    )
    mism = (
        F.col("ic").isNull()
        | F.col("fc").isNull()
        | (F.col("ic") != F.col("fc"))
        | (F.col("isum") != F.col("fsum"))
    )
    summary = audit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(mism, 1).otherwise(0)).cast("bigint").alias("n_mismatch"),
    )
    extras = [
        F.broadcast(delta.agg(F.count(F.lit(1)).cast("bigint").alias("groups_with_delta"))),
        F.broadcast(
            mv1_live.agg(
                F.sum("c").cast("bigint").alias("rows_after"),
                F.sum("s").cast("bigint").alias("cents_after"),
            )
        ),
        F.broadcast(
            mv1_inc.where(F.col("c") == 0).agg(
                F.count(F.lit(1)).cast("bigint").alias("groups_retired")
            )
        ),
    ]
    out = summary
    for e in extras:
        out = out.crossJoin(e)
    return out
