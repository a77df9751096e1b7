"""Time-series plans over the event hypertable: date-spine gap
filling, OHLC downsampling, and time-weighted averages (SURVEY.md §2B
event-time family; the reference — SidetrekAI/target-iceberg,
write-only — has no query surface).

These are the TimescaleDB/warehouse time-series staples re-expressed
Spark-first: bounded per-key explodes instead of range self-joins,
combinable min_by/max_by aggregates instead of window-rank detours,
and exact integer-µs arithmetic wherever a float epoch would drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "events_gapfill",
    oracle="""
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id, CAST(ts AS DATE)
),
spans AS (
    SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
    FROM daily GROUP BY user_id
),
spine AS (
    SELECT user_id,
           CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
    FROM spans
)
SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n_events
FROM spine s LEFT JOIN daily d USING (user_id, day)
ORDER BY s.user_id, s.day
""",
    tags=("events", "timeseries"),
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling: each user's daily event counts with the
    silent days inside their own [first, last] activity span filled
    with explicit zeros — the resample step every downstream
    time-series model (forecasting, anomaly scoring, retention decay)
    needs before it can treat the series as regular.

    Scale shape: collapse to (user, day) counts FIRST (combinable
    groupBy, cardinality ≤ users × days regardless of event volume),
    derive each user's span with a second combinable aggregate, then
    explode sequence(d0, d1) — a per-user fan-out bounded by the span
    length, not a calendar cross-join against the global date range —
    and left-join the counts back on the (user, day) equi-key. No
    window, no range join; the spine join co-partitions with the
    counts on the same key. At 100 TB the explode output is exactly
    the report's own size, so nothing here exceeds the result."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day", F.coalesce("n", F.lit(0)).alias("n_events")
        )
        .orderBy("user_id", "day")
    )


@register(
    "events_ohlc",
    oracle="""
WITH h AS (
    SELECT event_type, date_trunc('hour', ts) AS hour, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
)
SELECT event_type, hour,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS volume
FROM h
GROUP BY event_type, hour
ORDER BY event_type, hour
""",
    tags=("events", "timeseries", "downsample"),
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) candles per event type — the
    classic downsample that turns a raw tick stream into a bounded
    bar series (finance ticks, sensor readings, metric samples).

    Scale shape: ONE combinable groupBy per (type, hour) bucket;
    open/close are min_by/max_by over the deterministic (ts, event_id)
    struct key — first/last as ordinary combinable aggregates, so the
    map side partially combines and no per-bucket window sort ever
    runs (the oracle spells the same answer with row_number because
    DuckDB's arg_min lacks composite keys — Spark never pays that
    window). high/low/count/volume are plain aggregates. At 100 TB
    this is the canonical partial-agg shape: output is bounded by
    types × hours, independent of tick volume."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "events_time_weighted",
    oracle="""
WITH seg AS (
    SELECT user_id, value,
           epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
    FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dt_us) AS BIGINT) AS held_us,
       ROUND(SUM(value * dt_us) / SUM(dt_us), 6) AS twa_value
FROM seg
WHERE dt_us IS NOT NULL AND value IS NOT NULL
GROUP BY user_id
ORDER BY user_id
""",
    tags=("events", "timeseries"),
)
def events_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value — the irregular-sampling
    average (TimescaleDB's time_weight) where each observation counts
    for how LONG it held, not how often it was sampled: a value
    observed at t_i holds until the next event at t_i+1 and
    contributes value × Δt. Last events (no successor) and NULL-value
    segments carry no held time and drop from both numerator and
    denominator.

    Scale shape: one lead() over the per-user (ts, event_id) ordering
    — a single hash-partition shuffle bounded by each user's own
    history — then a combinable per-user aggregate; no self-join
    against the next reading. Δt stays exact integer µs (unix_micros
    both engines); only the final ratio is a double, ROUND(6)ed to
    collapse sum-order ulp skew."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull() & F.col("value").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dt_us").alias("held_us"),
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


TRAJ_PROBE_USER = 0
TRAJ_TOP_K = 20


@register(
    "sim_trajectory_users",
    oracle=f"""
WITH seq AS (
    SELECT user_id,
           event_type || '>' || LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS bg
    FROM events
),
bgs AS (SELECT DISTINCT user_id, bg FROM seq WHERE bg IS NOT NULL),
probe AS (SELECT bg FROM bgs WHERE user_id = {TRAJ_PROBE_USER}),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probe FROM probe),
per_user AS (
    SELECT b.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_user,
           CAST(SUM(CASE WHEN p.bg IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS inter
    FROM bgs b LEFT JOIN probe p ON b.bg = p.bg
    WHERE b.user_id <> {TRAJ_PROBE_USER}
    GROUP BY b.user_id
)
SELECT user_id,
       ROUND(CAST(inter AS DOUBLE)
             / (n_user + np.n_probe - inter), 6) AS jaccard
FROM per_user CROSS JOIN np
ORDER BY jaccard DESC, user_id
LIMIT {TRAJ_TOP_K}
""",
    tags=("events", "trajectory", "similarity"),
)
def sim_trajectory_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k behaviorally-similar users to a probe user — trajectory
    similarity search in the REPOSE (ICDE 2021) family, with each
    user's trajectory summarized to its SET of consecutive event-type
    bigrams (a reference-point-style signature: |types|²-bounded per
    user regardless of history length) and ranked by exact Jaccard
    against the probe's signature.

    Scale shape: signature extraction is one per-user window pass +
    a combinable distinct; the probe signature (≤ |types|² rows)
    broadcasts into an equi-join whose per-user intersection count is
    a combinable SUM; Jaccard is integer-count arithmetic (exact in
    both engines, ROUND(6) only for display) and the finisher is
    TakeOrderedAndProject — never an all-pairs trajectory comparison.
    Swapping the signature for minhashed shingles turns this into the
    dedup tier's LSH machinery unchanged when the probe SET is large."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.concat_ws(
            ">", "event_type", F.lead("event_type").over(w)
        ).alias("bg"),
        F.lead("event_type").over(w).alias("_nxt"),
    ).where(F.col("_nxt").isNotNull())
    bgs = seq.select("user_id", "bg").distinct()
    probe = bgs.where(F.col("user_id") == TRAJ_PROBE_USER).select("bg")
    np_ = probe.agg(F.count(F.lit(1)).alias("n_probe"))
    per_user = (
        bgs.where(F.col("user_id") != TRAJ_PROBE_USER)
        .join(F.broadcast(probe.withColumn("_hit", F.lit(1))), "bg", "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_user"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("inter"),
        )
    )
    return (
        per_user.crossJoin(F.broadcast(np_))
        .select(
            "user_id",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_user") + F.col("n_probe") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "user_id")
        .limit(TRAJ_TOP_K)
    )
