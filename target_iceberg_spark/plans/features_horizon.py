"""Feature-store horizon features and key-space integrity audit
(SURVEY.md §2B event-time / profiling tiers, round 7).

  * events_multi_horizon — the canonical online-feature shape: per
    user, activity counts/sums over trailing 1 h / 24 h / 7 d
    horizons, all three frames sharing ONE partition+sort, snapshot
    taken at each user's latest event (what a feature store would
    serve right now).
  * profile_key_gaps — surrogate-key integrity: how contiguous is a
    key space, how many islands, how many missing ids — computed with
    an anti-join instead of the textbook global lag window, so the
    audit itself survives the table sizes it audits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

H1 = 3600 * 1_000_000  # 1 h in µs
H24 = 24 * H1
H7D = 7 * H24


@register(
    "events_multi_horizon",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
),
feat AS (
    SELECT user_id, event_id, us,
           COUNT(*) OVER w1 AS n_1h,
           COUNT(*) OVER w24 AS n_24h,
           COUNT(*) OVER w7 AS n_7d,
           SUM(value) OVER w24 AS v_24h,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM e
    WINDOW w1 AS (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN {H1} PRECEDING AND CURRENT ROW),
           w24 AS (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN {H24} PRECEDING AND CURRENT ROW),
           w7 AS (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN {H7D} PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       CAST(n_1h AS BIGINT) AS n_1h,
       CAST(n_24h AS BIGINT) AS n_24h,
       CAST(n_7d AS BIGINT) AS n_7d,
       ROUND(v_24h, 2) AS v_24h
FROM feat WHERE rn = 1
ORDER BY user_id
""",
    tags=("events", "features", "feature-store"),
)
def events_multi_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon recency features, snapshotted at each user's
    latest event: trailing 1 h / 24 h / 7 d event counts and the 24 h
    value sum — the classic online-feature vector (velocity rules,
    engagement scores) materialized in batch. Complements
    events_decay_features: horizons give the interpretable "N in the
    last day" a rules engine wants; the decay sum gives the O(1)
    streaming-maintainable alternative.

    Scale shape: all three RANGE frames and the latest-event
    row_number share ONE partitionBy(user_id) ordering, so Spark
    plans a single hash-partition shuffle + one sort for the whole
    feature vector; the widest frame is one user's history. Range
    frames key on integer epoch-µs (identical arithmetic both
    engines; calendar INTERVAL frames differ in tz handling)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    base = Window.partitionBy("user_id").orderBy("us")
    w1 = base.rangeBetween(-H1, 0)
    w24 = base.rangeBetween(-H24, 0)
    w7 = base.rangeBetween(-H7D, 0)
    latest = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    feat = e.select(
        "user_id",
        F.count(F.lit(1)).over(w1).alias("n_1h"),
        F.count(F.lit(1)).over(w24).alias("n_24h"),
        F.count(F.lit(1)).over(w7).alias("n_7d"),
        F.sum("value").over(w24).alias("_v24"),
        F.row_number().over(latest).alias("_rn"),
    ).where(F.col("_rn") == 1)
    return feat.select(
        "user_id",
        "n_1h",
        "n_24h",
        "n_7d",
        F.round("_v24", 2).alias("v_24h"),
    ).orderBy("user_id")


@register(
    "profile_key_gaps",
    oracle="""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
starts AS (
    SELECT COUNT(*) AS n_islands
    FROM keys a
    WHERE NOT EXISTS (SELECT 1 FROM keys b WHERE b.k = a.k - 1)
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM keys
)
SELECT n_keys, min_key, max_key,
       CAST(max_key - min_key + 1 - n_keys AS BIGINT) AS n_missing,
       CAST(n_islands AS BIGINT) AS n_islands,
       ROUND(CAST(n_keys AS DOUBLE) / n_islands, 4) AS avg_island_len
FROM agg, starts
""",
    tags=("profiling", "integrity", "gaps"),
)
def profile_key_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-space contiguity audit for a surrogate key (orderkey —
    TPC-H deliberately leaves 3 of every 4 ids unused, so the islands
    structure is rich): distinct count, span, missing-id count, and
    the number of contiguous islands with their mean length — the
    ingestion-integrity numbers that catch a dropped batch (one new
    hole) or a replayed range (span grows, count doesn't).

    Scale shape: the textbook form is LAG over a GLOBAL key ordering
    — a single-partition window over every key, the exact scale
    killer the plan CI sweeps for. Here islands are counted WITHOUT
    any ordering: an island starts at k iff k-1 is absent, which is
    ONE distinct pass plus ONE self anti-join on k-1 (hash-partitioned
    equi-join, combinable count). Everything else is min/max/count
    aggregates; two one-row frames cross at the end."""
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_orderkey").alias("k")).distinct()
    prev = keys.select((F.col("k") + 1).alias("k"))
    starts = keys.join(prev, "k", "left_anti").agg(
        F.count(F.lit(1)).alias("n_islands")
    )
    agg = keys.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )
    return agg.crossJoin(F.broadcast(starts)).select(
        "n_keys",
        "min_key",
        "max_key",
        (F.col("max_key") - F.col("min_key") + 1 - F.col("n_keys")).alias(
            "n_missing"
        ),
        "n_islands",
        F.round(
            F.col("n_keys").cast("double") / F.col("n_islands"), 4
        ).alias("avg_island_len"),
    )
