"""Distinct-key growth profile (SURVEY.md §2B profiling tier,
round 8).

How fast does the distinct-key population grow as data arrives? The
empirical Heaps-law curve (Heaps 1978, public) every capacity plan
needs: it sizes dedup state (dedup_bloom_incremental's filter, the
streaming twins' per-key state), forecasts dimension growth, and
flags key-generation regressions (a sudden new-key burst = an ID
scheme change or a bot wave). Computed exactly from FIRST
OCCURRENCES: a key contributes to the decile its first event lands
in, so the whole curve needs one aggregate per key — never a
cumulative distinct over the stream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

NDV_BUCKETS = 10


@register(
    "profile_ndv_growth",
    oracle=f"""
WITH bounds AS (
    SELECT MIN(event_id) AS lo, MAX(event_id) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
),
firsts AS (
    SELECT user_id, MIN(event_id) AS first_id FROM events GROUP BY user_id
),
bucketed AS (
    SELECT LEAST((f.first_id - b.lo) * {NDV_BUCKETS}
                 // (b.hi - b.lo + 1), {NDV_BUCKETS - 1}) AS bucket
    FROM firsts f, bounds b
),
ev_bucketed AS (
    SELECT LEAST((e.event_id - b.lo) * {NDV_BUCKETS}
                 // (b.hi - b.lo + 1), {NDV_BUCKETS - 1}) AS bucket
    FROM events e, bounds b
),
nk AS (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_keys
    FROM bucketed GROUP BY bucket
),
ne AS (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ev_bucketed GROUP BY bucket
)
SELECT ne.bucket, ne.n_events,
       COALESCE(nk.new_keys, 0) AS new_keys,
       CAST(SUM(COALESCE(nk.new_keys, 0)) OVER (
           ORDER BY ne.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_keys
FROM ne LEFT JOIN nk USING (bucket)
ORDER BY ne.bucket
""",
    tags=("profiling", "ndv", "heaps"),
)
def profile_ndv_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-cumulative distinct users per ingest decile: the event
    stream splits into {NDV_BUCKETS} equal event-id ranges (the
    arrival order proxy), each user counts once in the decile of its
    FIRST event, and the running total is the empirical Heaps curve.
    A flattening curve means dedup state is saturating; a late spike
    means new-key pressure (capacity or abuse signal).

    Scale shape: the first-occurrence table is one combinable
    min-per-key aggregate (the dedup_incremental primitive); bucket
    arithmetic is scalar against the broadcast one-row bounds; the
    cumulative runs over {NDV_BUCKETS} rows (aggregate-bounded
    window). The naive alternative — COUNT(DISTINCT) per growing
    prefix — rescans the stream per decile; first-occurrences make
    the full curve one pass."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    firsts = ev.groupBy("user_id").agg(F.min("event_id").alias("first_id"))

    def bucket_of(col):
        # integer division on BOTH sides: DuckDB's / on ints is float
        # division and its double->int cast ROUNDS (Spark truncates),
        # so the boundary rows would land in different buckets
        return F.least(
            F.expr(
                f"(({col} - lo) * {NDV_BUCKETS}) div (hi - lo + 1)"
            ),
            F.lit(NDV_BUCKETS - 1).cast("bigint"),
        )

    nk = (
        firsts.crossJoin(F.broadcast(bounds))
        .select(bucket_of("first_id").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_keys"))
    )
    ne = (
        ev.crossJoin(F.broadcast(bounds))
        .select(bucket_of("event_id").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ne.join(nk, "bucket", "left")
        .select(
            "bucket",
            "n_events",
            F.coalesce("new_keys", F.lit(0)).alias("new_keys"),
        )
        .withColumn(
            "cum_keys", F.sum("new_keys").over(cum).cast("bigint")
        )
        .orderBy("bucket")
    )
