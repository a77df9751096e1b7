"""Structured Streaming pipelines.

The reference's runtime IS a stream processor in the small: an
unbounded stdin message stream, per-stream buffers, batch commits at
size/STATE boundaries, at-least-once state emission (SURVEY §3). This
module is that lifecycle on Spark's engine:

  readStream (file source)  ->  event-time transforms (tumbling /
  sliding / session windows with watermark)  ->  foreachBatch into
  StreamWriter.append  +  checkpoint.

Semantics mapping:
  - reference max_size=10000 buffer drain  -> micro-batch trigger
    (availableNow for bounded catch-up, processingTime for tailing)
  - reference STATE emit after drain       -> checkpoint commit after
    each epoch (exactly-once to the parquet/Iceberg sink via
    idempotent-by-epoch appends; the reference is only at-least-once)
  - late records (reference: appended whenever they arrive) ->
    withWatermark bounds state: in append output mode, events later
    than the watermark delay are dropped from windowed aggregates
    (complete mode keeps all state and never drops — mode semantics
    are spelled out on write_stream_to_table).

The windowed transforms are the SAME window()/session_window()
expressions the batch plans use (plans/streaming_batch.py), so their
results are oracle-checked in batch mode; streaming tests assert
batch/stream construction equivalence at sf0.001.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from target_iceberg_spark.writer import StreamWriter


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of events parquet normalized to a timestamp
    `ts` column.

    File streaming sources require an explicit schema, and the events
    table has shipped with two physical layouts for `ts` (epoch-nanos
    INT64 and native timestamp[us]) — so probe the directory's on-disk
    schema with a batch read (driver-side footer read, no data scan)
    and normalize either layout, mirroring the batch loader
    (sources/tables.py). An EMPTY directory (stream started before the
    producer's first file — the normal bootstrap order) cannot be
    probed, so it falls back to the current writer layout
    (timestamp[us]); a directory must be layout-HOMOGENEOUS — mixed
    nanos/µs files cannot be described by one file-source schema in
    either layout.

    ``path`` must be a DIRECTORY (Spark file-source contract — new
    files appearing there become new micro-batches). For a single
    parquet file, symlink it into a directory first.
    """
    import os

    if os.path.isfile(path):
        raise ValueError(
            f"streaming source must be a directory, got file: {path} "
            "(symlink it into a directory)"
        )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        probed = spark.read.parquet(path).schema
    except AnalysisException:
        # AnalysisException only — that's the genuine "no files yet"
        # signal (UNABLE_TO_INFER_SCHEMA / PATH_NOT_FOUND). Anything
        # else (permissions, corrupt footer, transient FS error) must
        # SURFACE, not silently start the stream with an assumed
        # layout that may be wrong for the files actually there.
        from pyspark.sql.types import StructType

        probed = StructType.fromDDL(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
    reader = spark.readStream.schema(probed)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path)
    ts_type = dict((f.name, f.dataType.simpleString()) for f in probed.fields).get(
        "ts", ""
    )
    # Watermarks require TIMESTAMP (ltz), not TIMESTAMP_NTZ — under the
    # UTC session timezone the wall-clock values are identical.
    if ts_type == "bigint":  # legacy epoch-nanos layout
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregate — the streaming twin of
    plans/streaming_batch.py::stream_tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value"
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked session-window aggregate (streaming twin of
    stream_session)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
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


def ohlc_candles(
    events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked OHLC downsampler — the streaming twin of
    plans/analytics_ts.py::events_ohlc. Open/close are min_by/max_by
    over the deterministic (ts, event_id) struct key, which streaming
    state merges exactly like batch partial aggregation (each
    micro-batch updates the per-window extremum-keyed pair), so the
    finalized candles match the batch query bit-for-bit once the
    watermark closes a window."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
    )


def infer_output_mode(df: DataFrame) -> str:
    """'complete' for aggregating streaming plans, 'append' otherwise
    (complete-mode start on a stateless plan is an AnalysisException,
    and append on an unwatermark-finalized aggregate emits nothing)."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        return "complete" if "Aggregate" in plan else "append"
    except Exception:
        return "append"


def write_stream_to_table(
    df: DataFrame,
    writer: StreamWriter,
    stream_name: str,
    checkpoint_dir: str,
    output_mode: str | None = None,
    upsert_keys: list[str] | None = None,
) -> StreamingQuery:
    """Sink a streaming DataFrame through the engine writer with
    foreachBatch + checkpointing (availableNow trigger: drain whatever
    is available, then stop — the bounded-backfill mode).

    Semantics per mode:
      - append: each epoch's NEW rows are appended. An epoch high-water
        mark stored INSIDE the checkpoint dir (so it shares the query's
        identity and lifecycle) makes Spark's epoch REPLAYS idempotent;
        a crash in the window between data commit and marker advance
        still degrades to at-least-once — true exactly-once needs a
        transactional table format (Iceberg), not a parquet directory.
        Watermarked aggregates in this mode emit only finalized windows
        and DROP late rows.
      - complete: each epoch carries the FULL result — the sink
        OVERWRITES, so re-emission never duplicates rows. No late-row
        dropping: state is unbounded by definition of the mode.

    ``upsert_keys`` switches the sink to last-write-wins MERGE on those
    key columns (streaming CDC apply): upsert is naturally idempotent —
    an epoch replay merges the same rows to the same state — so no
    epoch marker is needed and crash recovery is exactly-once at the
    row-state level even on the parquet warehouse.

    When ``output_mode`` is None the mode is inferred from the plan;
    if the inferred mode is rejected at start (e.g. a batch-side
    Aggregate misread as a streaming one), the other mode is tried.
    """
    import os

    marker = os.path.join(checkpoint_dir, "_engine_epoch")

    def _read_marker() -> int:
        try:
            with open(marker) as fh:
                return int(fh.read().strip() or -1)
        except (OSError, ValueError):
            return -1

    def _advance_marker(epoch_id: int) -> None:
        try:
            tmp = f"{marker}.tmp"
            with open(tmp, "w") as fh:
                fh.write(str(epoch_id))
            os.replace(tmp, marker)  # atomic on a local checkpoint fs
        except OSError:
            pass  # marker is an idempotence optimization, not a gate

    def _make_sink(mode: str):
        def _sink(batch_df: DataFrame, epoch_id: int) -> None:
            if upsert_keys:
                writer.upsert(batch_df, stream_name, upsert_keys)
                return
            if mode == "complete":
                writer.overwrite(batch_df, stream_name)
                return
            if epoch_id <= _read_marker():
                return  # replayed epoch — already durable
            writer.append(batch_df, stream_name)
            _advance_marker(epoch_id)

        return _sink

    def _start(mode: str) -> StreamingQuery:
        return (
            df.writeStream.outputMode(mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .foreachBatch(_make_sink(mode))
            .start()
        )

    if output_mode is not None:
        return _start(output_mode)
    inferred = infer_output_mode(df)
    try:
        return _start(inferred)
    except Exception:
        return _start("append" if inferred == "complete" else "complete")


def run_bounded(
    spark: SparkSession,
    source_path: str,
    writer: StreamWriter,
    stream_name: str,
    checkpoint_dir: str,
    transform=None,
    output_mode: str | None = None,
    upsert_keys: list[str] | None = None,
) -> None:
    """End-to-end bounded streaming run: file source -> optional
    transform -> writer sink; blocks until the availableNow drain
    completes. Output mode is inferred from the plan unless given;
    ``upsert_keys`` routes every micro-batch through the keyed MERGE
    sink instead of append."""
    events = read_event_stream(spark, source_path)
    out = transform(events) if transform is not None else events
    q = write_stream_to_table(
        out, writer, stream_name, checkpoint_dir,
        output_mode=output_mode, upsert_keys=upsert_keys,
    )
    q.awaitTermination()


def interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    interval: str = "1 hour",
    watermark_delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: each purchase matched to
    same-user clicks in the preceding ``interval``.

    Both sides carry a watermark and the join condition bounds
    click_ts within [purchase_ts - interval, purchase_ts], so Spark
    derives a finite state-retention window per side (clicks older
    than watermark - interval are evicted) — the property that keeps
    stream-stream join state bounded on unbounded streams. Inner join
    in append mode emits each match exactly once.

    ``how="leftOuter"`` additionally emits every UNMATCHED purchase
    with NULL click columns — but only once the join's GLOBAL watermark
    (the MIN across both sides' watermarks) passes the end of its join
    window, since until then a matching click could still arrive. A
    bounded availableNow drain therefore needs later events on BOTH
    input sides for trailing unmatched rows to flush
    (tests/test_streaming.py pins exactly that).

    Inputs must be pre-projected: purchases(user_id, purchase_id,
    purchase_ts), clicks(c_user_id, click_id, click_ts).
    """
    import pyspark.sql.functions as F

    p = purchases.withWatermark("purchase_ts", watermark_delay)
    c = clicks.withWatermark("click_ts", watermark_delay)
    return p.join(
        c,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {interval}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        how,
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


def interval_join_left(
    purchases: DataFrame,
    clicks: DataFrame,
    interval: str = "1 hour",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """LEFT OUTER form of :func:`interval_join` (see its docstring for
    the watermark-finalization semantics of unmatched emission)."""
    return interval_join(purchases, clicks, interval, watermark_delay, "leftOuter")
