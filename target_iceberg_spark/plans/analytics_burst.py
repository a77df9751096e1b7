"""Burst-episode detection over the event stream (SURVEY.md §2B
time-series tier, round-6 post-window).

events_anomaly flags single outlier points and events_level_shift
sustained regime changes; this detects BURSTS — consecutive runs of
elevated activity — and groups them into episodes with the classic
gaps-and-islands rewrite (row_number difference as the island key),
the batch-shaped cousin of Kleinberg's burst automaton (KDD'02,
public) with a fixed rate threshold instead of HMM states.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

BURST_MULT = 1.5  # hourly count must exceed MULT x the type's mean rate
BURST_MIN_HOURS = 2  # minimum consecutive elevated hours per episode


@register(
    "events_burst",
    oracle=f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           CAST(COUNT(*) AS DOUBLE) AS cnt
    FROM events GROUP BY event_type, date_trunc('hour', ts)
),
flagged AS (
    SELECT event_type, h, cnt,
           AVG(cnt) OVER (PARTITION BY event_type) AS mean_cnt
    FROM hourly
),
hot AS (
    SELECT event_type, h, cnt,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM flagged WHERE cnt > {BURST_MULT} * mean_cnt
),
islands AS (
    SELECT event_type, h, cnt,
           h - to_hours(rn) AS island
    FROM hot
),
episodes AS (
    SELECT event_type, island,
           MIN(h) AS start_h,
           MAX(h) AS end_h,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           SUM(cnt) AS n_events
    FROM islands
    GROUP BY event_type, island
    HAVING COUNT(*) >= {BURST_MIN_HOURS}
)
SELECT event_type, start_h, end_h, n_hours,
       CAST(n_events AS BIGINT) AS n_events
FROM episodes
ORDER BY event_type, start_h
""",
    tags=("timeseries", "burst", "events"),
)
def events_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst episodes per event type: hours whose event count exceeds
    {BURST_MULT}x the type's mean hourly rate, grouped into maximal
    consecutive runs (episodes) of at least {BURST_MIN_HOURS} hours,
    reported with span and volume — the incident-window extractor an
    on-call dashboard or a crawl-scheduler reads, and the batch
    analogue of Kleinberg burst states.

    The islands key is the CALENDAR rewrite h - rn hours (consecutive
    hot hours share it); because rn counts only HOT hours per type, a
    cold gap breaks the island exactly — the gaps-and-islands
    discipline shared with events_streaks, on the hour grid instead
    of days.

    Scale shape: one combinable hourly count is the only full-data
    stage; the threshold mean, island numbering, and episode rollup
    all run over the calendar-bounded (event_type, hour) frame — the
    whitelisted bounded-window class. Counts are integers, so the
    threshold comparison and all outputs are engine-exact without
    rounding."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    by_type = Window.partitionBy("event_type")
    flagged = hourly.select(
        "event_type", "h", "cnt", F.avg("cnt").over(by_type).alias("mean_cnt")
    )
    hot = flagged.where(
        F.col("cnt") > BURST_MULT * F.col("mean_cnt")
    ).select(
        "event_type",
        "h",
        "cnt",
        F.row_number().over(by_type.orderBy("h")).alias("rn"),
    )
    islands = hot.select(
        "event_type",
        "h",
        "cnt",
        F.expr("h - make_interval(0, 0, 0, 0, rn, 0, 0)").alias("island"),
    )
    return (
        islands.groupBy("event_type", "island")
        .agg(
            F.min("h").alias("start_h"),
            F.max("h").alias("end_h"),
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("cnt").cast("bigint").alias("n_events"),
        )
        .where(F.col("n_hours") >= BURST_MIN_HOURS)
        .select("event_type", "start_h", "end_h", "n_hours", "n_events")
        .orderBy("event_type", "start_h")
    )
