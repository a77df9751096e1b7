"""Event-time window plans, batch-expressible (SURVEY.md §2B).

window() and session_window() are the same operators Structured
Streaming uses — running them in batch mode makes them oracle-
checkable (DuckDB sessionizes with the lag/gap/cumsum idiom). The true
streaming wrappers (readStream + watermark + foreachBatch into the
writer) live in streaming/pipeline.py with construction-equivalence
tests instead of a SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "stream_tumbling",
    oracle="""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming",),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event type. Epoch-aligned
    window() == date_trunc('hour') for the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value"
        )
    )


@register(
    "rollup_hypertable",
    oracle="""
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "rollup"),
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable/continuous-aggregate pattern: a fine-grained (hourly)
    rollup answers coarser (daily) queries by re-aggregating partial
    states — distributive aggregates (count, sum) are lossless across
    levels, which the oracle proves by computing daily DIRECTLY from
    raw events. At scale the hourly table is materialized incrementally
    by the streaming pipeline (foreachBatch into the writer) and is
    orders of magnitude smaller than the raw events it summarizes."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour_start").alias("day_start"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
        )
    )


@register(
    "stream_late_data",
    oracle="""
SELECT TIMESTAMP '2024-01-01 00:00:00' AS win_start,
       'click' AS event_type,
       CAST(10 AS BIGINT) AS n_events,
       CAST(10.0 AS DOUBLE) AS sum_value
UNION ALL
SELECT TIMESTAMP '2024-01-01 05:00:00', 'click',
       CAST(2 AS BIGINT), CAST(2.0 AS DOUBLE)
ORDER BY win_start
""",
    tags=("streaming", "watermark", "audit"),
    bench=False,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data policy, exercised on the REAL streaming path:
    three bounded runs over a shared checkpoint — run 1 advances the
    watermark past an old window, run 2 delivers a too-late event into
    it (dropped), an admissible one into a still-open window (counted),
    and a watermark-pusher; run 3 flushes the newly-finalized window.
    Returns BOTH finalized windows, so the result discriminates every
    policy outcome: (00:00, n=10) proves the too-late event was dropped
    (11 would mean it leaked in), (05:00, n=2) proves the
    within-watermark event was counted.

    HASH-CHECKABLE since round 10 (was the last reducible rows-only
    entry; VERDICT r9 task 5): the fixture is static and the
    append-mode final table after the third run is DETERMINISTIC, so
    the oracle is the hand-derivable batch aggregation of the injected
    events minus exactly the dropped late event — window 00:00 holds
    its 10 on-time events (the 11th, event 100 at 00:30, arrives
    behind the 04:00 watermark and must be dropped; 11 here means the
    watermark leaked), window 05:00 holds events 99+101 (2.0), and the
    07:00/08:00 windows are still open at shutdown so append mode
    never emits them. The three-run watermark mechanics stay pinned in
    tests/test_streaming.py::test_watermark_drops_late_events.
    Excluded from bench (multi-run setup)."""
    import os
    import shutil
    import tempfile

    import pandas as pd

    from target_iceberg_spark.streaming.pipeline import (
        read_event_stream,
        tumbling_counts,
    )

    work = tempfile.mkdtemp(prefix="late_data_")
    src = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.mkdir(src)

    def write_file(name: str, rows: list[tuple[int, str]]) -> None:
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [int(pd.Timestamp(r[1]).value) for r in rows],
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        ).to_parquet(os.path.join(src, name))

    def run_once() -> None:
        agg = tumbling_counts(read_event_stream(spark, src), "1 hour", "1 hour")
        q = (
            agg.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out_dir)
            .start()
        )
        q.awaitTermination()

    write_file(
        "0.parquet",
        [(i, f"2024-01-01 00:{i:02d}:00") for i in range(10)]
        + [(99, "2024-01-01 05:00:00")],
    )
    run_once()
    # run 2: a too-late event (00:30, behind the 04:00 watermark —
    # dropped), an admissible one (05:30, inside the open 05:00 window)
    # and a pusher (07:30) that moves the watermark to 06:30, past the
    # 05:00 window's end
    write_file(
        "1.parquet",
        [
            (100, "2024-01-01 00:30:00"),
            (101, "2024-01-01 05:30:00"),
            (102, "2024-01-01 07:30:00"),
        ],
    )
    run_once()
    # run 3: one event whose own window stays open (watermark ends at
    # 07:30 < its 09:00 window end) — it exists to run a batch under the
    # 06:30 watermark, guaranteeing the 05:00 window flushes finalized
    write_file("2.parquet", [(103, "2024-01-01 08:30:00")])
    run_once()
    # materialize the handful of finalized windows so the temp workspace
    # can be deleted (each invocation used to leak a late_data_* dir);
    # this tiny driver-side collect is the query's diagnostic output,
    # not a data path
    out = spark.read.parquet(out_dir)
    rows, schema = (
        bounded_collect(
            out,
            cap=64,
            why="finalized windows of the 3-file literal fixture",
            structural=False,
        ),
        out.schema,
    )
    shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema).orderBy("win_start")


@register(
    "stream_session",
    oracle="""
WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
g AS (
    SELECT *,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT *,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM g
)
SELECT user_id,
       MIN(ts) AS sess_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM s
GROUP BY user_id, sid
""",
    tags=("streaming",),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user. Spark merges an event
    into the open session iff gap < 30min (session end exclusive); the
    DuckDB oracle reproduces that with lag/cumsum sessionization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_dedup_first",
    oracle="""
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
)
WHERE rn = 1
""",
    tags=("streaming", "dedup"),
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen record per user — the batch twin of the custom
    stateful streaming dedup (streaming/stateful.py::first_seen_dedup,
    applyInPandasWithState with per-key state + processing-time
    timeout). Batch mode is one window shuffle; streaming/batch
    equivalence is asserted in tests/test_streaming.py."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "stream_sliding",
    oracle="""
WITH win AS (
    SELECT event_type, value,
           unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR,
                   date_trunc('hour', CAST(ts AS TIMESTAMP))]) AS win_start
    FROM events
)
SELECT win_start, event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM win
GROUP BY win_start, event_type
""",
    tags=("streaming", "sliding"),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 2-hour windows every 1 hour, so each
    event lands in exactly two overlapping windows. Spark's window()
    expands rows window-count-fold BEFORE the aggregate (an Expand node,
    same cost model as rollup), then one combinable groupBy; the DuckDB
    oracle unnests the two covering window starts per event. Sliding
    state in true streaming is bounded by windows-in-flight x groups,
    watermark-expired like tumbling."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ROLLUP_INC_SQL = """
WITH base_rollup AS (
    -- increment 1 (at scale: the STORED continuous-aggregate table)
    SELECT event_type, CAST(ts AS DATE) AS day,
           COUNT(*) AS n, SUM(value) AS sv
    FROM events WHERE event_id % 2 = 0
    GROUP BY event_type, CAST(ts AS DATE)
),
delta_rollup AS (
    -- increment 2 (the newly ingested batch, aggregated alone)
    SELECT event_type, CAST(ts AS DATE) AS day,
           COUNT(*) AS n, SUM(value) AS sv
    FROM events WHERE event_id % 2 = 1
    GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, day,
       CAST(SUM(n) AS BIGINT) AS n_events,
       ROUND(SUM(sv), 2) AS sum_value
FROM (SELECT * FROM base_rollup UNION ALL SELECT * FROM delta_rollup)
GROUP BY event_type, day
ORDER BY event_type, day
"""


@register(
    "rollup_incremental",
    # The oracle IS the semantic claim: merging per-batch partial
    # aggregates must equal the full recompute over all events.
    oracle="""
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY event_type, CAST(ts AS DATE)
ORDER BY event_type, day
""",
    tags=("rollup", "incremental", "maintenance"),
)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view-maintenance merge: two ingest increments are
    each rolled up alone (COUNT/SUM are self-maintainable partials),
    then merged by summing partials per (type, day) — the refresh a
    continuous aggregate runs per batch instead of rescanning history.
    The oracle is the FULL recompute over all events, so the driver
    hash-check proves merge == recompute, which is the whole
    correctness claim of incremental maintenance.

    Scale shape: at 100 TB the base side is a stored rollup table read
    back (bounded by types × days), only the new batch touches raw
    events, and the merge groupBy is combinable over partial rows.
    Both rollups and the merge partial-combine map-side; ROUND(2)
    collapses the add-order ulp between merged partial sums and the
    oracle's single-pass sum."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(ROLLUP_INC_SQL)
