"""Sketch-tier aggregates (SURVEY.md §2B approximate family).

percentile_approx runs a positional Greenwald-Khanna-style sketch that
is mergeable across partitions — the property that makes it the 100 TB
tool: each partition ships a bounded sketch, never its values, so
shuffle volume is O(partitions * sketch), independent of row count
(exact percentile shuffles every value to sort). Below the sketch's
accuracy capacity the result degenerates to exact nearest-rank, which
is what lets the DuckDB oracle (quantile_disc) hash-match at test SF;
at 100 TB the same query stays cheap and the answer carries the
documented rank-error bound instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ACCURACY = 100_000  # >> rows-per-group at test SF => exact nearest-rank


@register(
    "agg_approx_quantile",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       quantile_disc(value, 0.25) AS p25,
       quantile_disc(value, 0.50) AS p50,
       quantile_disc(value, 0.75) AS p75,
       quantile_disc(value, 0.95) AS p95
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("agg", "approx", "sketch"),
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch quantiles per group (p25/p50/p75/p95 of event
    value). Scalar output columns, one per percentile — array outputs
    don't survive order-insensitive hashing downstream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile_approx("value", 0.25, ACCURACY).alias("p25"),
            F.percentile_approx("value", 0.50, ACCURACY).alias("p50"),
            F.percentile_approx("value", 0.75, ACCURACY).alias("p75"),
            F.percentile_approx("value", 0.95, ACCURACY).alias("p95"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_mode",
    oracle="""
SELECT user_id, event_type AS top_type, n
FROM (
    SELECT user_id, event_type, COUNT(*) AS n,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS rn
    FROM events GROUP BY user_id, event_type
)
WHERE rn = 1
""",
    tags=("agg", "mode"),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key mode (most frequent event type). Spark 3.4+ has mode()
    but its tie-break is unspecified; count + row_number with an
    explicit alphabetical tie-break is deterministic across engines —
    required for reproducible pipelines and the hash-exact oracle. Two
    shuffles: combinable (user, type) count, then a window over the
    per-user handful of type rows."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), "n")
    )


HLL_MERGE_RTOL = 0.10  # Datasketches lgK=12 rsd ~1.6%; generous bound


@register(
    "agg_hll_rollup",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS merge_within_rtol
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("agg", "approx", "sketch", "rollup", "audit"),
)
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup — the continuous-aggregate
    pattern for COUNT DISTINCT: per (event_type, day) HLL sketches
    (Datasketches ``hll_sketch_agg``) are UNION-merged upward to a
    per-type total, the way a 100 TB pipeline answers "distinct users
    any period" from daily sketch tables without ever re-scanning raw
    events (the distinct-count sibling of `rollup_hypertable`; plain
    counts re-aggregate with SUM, distincts only merge via sketches).

    Hash-checkable audit row (round 9; previously rows-only): the
    Datasketches estimate has no SQL twin, but its error CONTRACT
    does — the merged estimate folds to a within-{HLL_MERGE_RTOL}
    boolean next to the SQL-exact n_days and distinct count, so the
    driver hash now pins sketch quality instead of recording
    rows-only (same reduction as sim_ann_quality / the round-9
    sim_ivf_recall_curve audit row). Scale
    shape: daily sketching is a combinable aggregate (each partition
    ships a bounded sketch, never user ids); the merge shuffles
    #days × #types sketches of ~2.5 KiB (lgConfigK=12), independent
    of event volume; the exact branch is the one that dies at 100 TB
    — kept here only as the audit."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= HLL_MERGE_RTOL
            ).alias("merge_within_rtol"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# agg_quantile_sketch_audit — GK rank-error contract at LOW accuracy
# --------------------------------------------------------------------

GK_LOW_ACC = 50  # deliberately coarse: rank error bound = n / 50 (2%)
GK_TARGET_Q = 0.5


@register(
    "agg_quantile_sketch_audit",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(value, {GK_TARGET_Q!r}), 6) AS exact_median,
       TRUE AS sketch_within_bound
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("agg", "approx", "sketch", "audit"),
)
def agg_quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile-sketch twin of the HLL/CMS/KMV/Bloom error audits:
    run percentile_approx at a DELIBERATELY coarse accuracy
    ({GK_LOW_ACC} -> rank error <= n/{GK_LOW_ACC}, the Greenwald-
    Khanna contract Spark documents for approx quantiles) and verify
    the estimate's EXACT rank interval intersects the target band —
    emitted as a boolean the oracle asserts TRUE, beside the SQL-exact
    group count and exact median. The estimate itself stays OUT of the
    output: GK merge order varies with partitioning, so the value is
    not cross-run stable, but the bound holds under every merge order
    — exactly what an audit row may pin.

    Scale shape: two combinable passes (sketch per group; conditional
    rank counts for the broadcast-joined estimates). At 100 TB the
    coarse sketch is the production setting and this query is the
    acceptance test that licenses it."""
    ev = load_table(spark, sf_dir, "events")
    est = ev.groupBy("event_type").agg(
        F.percentile_approx("value", GK_TARGET_Q, GK_LOW_ACC).alias("est")
    )
    eps = 1.0 / GK_LOW_ACC
    return (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.expr(f"percentile(value, {GK_TARGET_Q!r})"), 6).alias(
                "exact_median"
            ),
            (
                (
                    F.sum(F.when(F.col("value") < F.col("est"), 1).otherwise(0))
                    <= (F.lit(GK_TARGET_Q) + eps) * F.count(F.lit(1))
                )
                & (
                    F.sum(
                        F.when(F.col("value") <= F.col("est"), 1).otherwise(0)
                    )
                    >= (F.lit(GK_TARGET_Q) - eps) * F.count(F.lit(1))
                )
            ).alias("sketch_within_bound"),
        )
        .orderBy("event_type")
    )
