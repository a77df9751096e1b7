"""Singer JSONL message source — the reference's ingestion surface.

The reference (a Meltano Singer target) reads JSONL messages on stdin:
SCHEMA declares a stream's JSON Schema, RECORD carries one row, STATE
is a bookmark to re-emit once preceding records are durably written,
ACTIVATE_VERSION signals a full refresh (reference target.py:6,12 —
SDK-inherited listen loop; sinks.py:20-41 — per-stream buffering with
``max_size = 10000``, sinks.py:18).

Two ingestion paths, same semantics:

  * :class:`SingerTarget` — the parity path. A driver-side listen loop:
    demux messages per stream, buffer up to ``max_batch_size`` records,
    drain each full buffer (and all buffers at STATE/EOF) through the
    writer as one Spark batch. Matches the reference's lifecycle
    (SURVEY §3) including at-least-once STATE emission.

  * :func:`demux_singer_file` — the scale path the reference lacks.
    For bulk backfills (a 100 TB pile of Singer JSONL on object
    storage) the listen loop's driver-side buffering is the bottleneck,
    so instead: read the files as a distributed text DataFrame, filter
    RECORD lines per stream, and parse them executor-side with
    ``from_json`` under the translated schema. One Spark job per
    stream, fully parallel, no driver round-trip.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from datetime import date, datetime, timezone
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DataType, DateType, StructType, TimestampType

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.schema import json_schema_to_struct_type
from target_iceberg_spark.writer import StreamWriter

DEFAULT_MAX_BATCH_SIZE = 10_000  # reference sinks.py:18


def _coerce_value(value: Any, dtype: DataType) -> Any:
    """Parse ISO strings into temporal types for createDataFrame (the
    reference gets this via pyarrow's string->timestamp cast in
    ``pa.Table.from_pylist``, sinks.py:82)."""
    if value is None:
        return None
    if isinstance(dtype, TimestampType) and isinstance(value, str):
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        if dt.tzinfo is not None:  # normalize to UTC naive (session tz is UTC)
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    if isinstance(dtype, DateType) and isinstance(value, str):
        return date.fromisoformat(value)
    if isinstance(dtype, StructType) and isinstance(value, dict):
        return {f.name: _coerce_value(value.get(f.name), f.dataType) for f in dtype.fields}
    return value


def _coerce_record(record: dict[str, Any], schema: StructType) -> dict[str, Any]:
    return {f.name: _coerce_value(record.get(f.name), f.dataType) for f in schema.fields}


@dataclass
class _StreamState:
    """Per-stream sink state (mirrors one reference IcebergSink,
    sinks.py:20-34: stream_name + schema + key_properties + buffer)."""

    name: str
    schema: StructType
    key_properties: list[str]
    buffer: list[dict[str, Any]] = field(default_factory=list)
    # per-record time_extracted, parallel to buffer (None when absent)
    extracted: list[datetime | None] = field(default_factory=list)
    records_written: int = 0
    batches_written: int = 0
    version: int | None = None  # Singer table version (ACTIVATE_VERSION)
    wrote_untagged: bool = False  # batches drained before any version known


class SingerTarget:
    """Listen-loop target: Singer JSONL in, engine tables out.

    ``upsert_on_keys=True`` turns keyed streams into last-write-wins
    merges (engine extension); False replicates the reference's
    append-only behavior exactly (sinks.py:25,100).
    """

    def __init__(
        self,
        spark: SparkSession,
        writer: StreamWriter,
        max_batch_size: int = DEFAULT_MAX_BATCH_SIZE,
        upsert_on_keys: bool = False,
        state_callback: Callable[[dict[str, Any]], None] | None = None,
    ):
        self.spark = spark
        self.writer = writer
        self.max_batch_size = max_batch_size
        self.upsert_on_keys = upsert_on_keys
        self.state_callback = state_callback
        self.streams: dict[str, _StreamState] = {}
        self.emitted_states: list[dict[str, Any]] = []

    # -- message handling ------------------------------------------------
    def process_line(self, line: str) -> None:
        line = line.strip()
        if not line:
            return
        msg = json.loads(line)
        mtype = msg.get("type")
        if mtype == "SCHEMA":
            self._handle_schema(msg)
        elif mtype == "RECORD":
            self._handle_record(msg)
        elif mtype == "STATE":
            # STATE only re-emitted after preceding records are durable:
            # at-least-once, like the SDK (SURVEY §2 A15).
            self._drain_all()
            state = msg.get("value", {})
            self.emitted_states.append(state)
            if self.state_callback:
                self.state_callback(state)
        elif mtype == "ACTIVATE_VERSION":
            self._handle_activate(msg)
        elif mtype == "BATCH":
            self._handle_batch(msg)
        # unknown message types are ignored, as in the Singer spec

    def run(self, lines: Iterable[str]) -> dict[str, dict[str, int]]:
        for line in lines:
            self.process_line(line)
        self._drain_all()
        return {
            name: {"records": s.records_written, "batches": s.batches_written}
            for name, s in self.streams.items()
        }

    # -- internals -------------------------------------------------------
    def _handle_schema(self, msg: dict[str, Any]) -> None:
        name = msg["stream"]
        schema = json_schema_to_struct_type(msg["schema"])
        key_properties = list(msg.get("key_properties") or [])
        existing = self.streams.get(name)
        if existing is not None:
            # Taps routinely re-emit SCHEMA mid-sync. Replacing the
            # stream state here would reset version / records_written /
            # wrote_untagged, and a later ACTIVATE_VERSION would then
            # look like a start-of-sync announcement and silently skip
            # retiring older-version rows. Drain under the old schema,
            # then swap schema/keys in place, keeping sync progress.
            if existing.buffer:
                self._drain(existing)
            existing.schema = schema
            existing.key_properties = key_properties
            return
        self.streams[name] = _StreamState(
            name=name, schema=schema, key_properties=key_properties
        )

    def _handle_record(self, msg: dict[str, Any]) -> None:
        name = msg["stream"]
        if name not in self.streams:
            raise ValueError(f"RECORD for stream {name!r} before its SCHEMA")
        stream = self.streams[name]
        if msg.get("version") is not None:
            stream.version = int(msg["version"])
        stream.buffer.append(_coerce_record(msg["record"], stream.schema))
        # RECORD's optional time_extracted feeds _sdc_extracted_at
        # (SDK metadata, SURVEY §2 A12) when the writer stamps metadata
        te = msg.get("time_extracted")
        stream.extracted.append(
            _coerce_value(te, TimestampType()) if isinstance(te, str) else None
        )
        if len(stream.buffer) >= self.max_batch_size:
            self._drain(stream)

    def _handle_activate(self, msg: dict[str, Any]) -> None:
        """Singer ACTIVATE_VERSION (the reference parses-but-ignores it —
        SURVEY §2 A16): activating version v completes a full refresh, so
        rows of OLDER versions are retired. Batches of the activated
        version already on disk are preserved (never an overwrite-with-
        current-buffer, which would destroy earlier-drained batches of
        the same sync). Rows written before any version was known can't
        be attributed — they are left in place rather than guessed at."""
        stream = self.streams.get(msg.get("stream", ""))
        version = msg.get("version")
        if stream is None or version is None:
            return
        version = int(version)
        if stream.version is None and not stream.buffer and stream.records_written == 0:
            # start-of-sync announcement: just adopt the version
            stream.version = version
            return
        if stream.version is None:
            stream.version = version  # tag the still-buffered rows
        self._drain(stream)
        if stream.wrote_untagged:
            return  # ambiguous history — keep data, don't guess
        try:
            cols = self.writer.read(stream.name).columns
        except Exception:
            return  # nothing on disk yet
        if "_sdc_table_version" not in cols:
            return  # pre-existing unversioned table — keep data
        self.writer.delete_where(
            stream.name, f"_sdc_table_version < {version}"
        )

    def _handle_batch(self, msg: dict[str, Any]) -> None:
        """Singer SDK ``BATCH`` message (SURVEY §2 A1): the tap has
        already written records to files — JSONL, one bare record dict
        per line — and sends a manifest of paths. The reference's SDK
        parses these; this engine routes them down the distributed bulk
        path: the files are read as a text DataFrame and parsed
        executor-side with ``from_json`` (same plan as
        :func:`demux_singer_file`), skipping the driver-side record
        buffer entirely — which is the point of BATCH at scale."""
        name = msg.get("stream", "")
        if name not in self.streams:
            raise ValueError(f"BATCH for stream {name!r} before its SCHEMA")
        stream = self.streams[name]
        fmt = (msg.get("encoding") or {}).get("format", "jsonl")
        if fmt != "jsonl":
            raise ValueError(f"unsupported BATCH encoding format: {fmt!r}")
        manifest = msg.get("manifest") or []
        if not manifest:
            return
        # drain buffered RECORDs first so per-stream arrival order holds
        self._drain(stream)
        # gzip et al. are handled by the text source via file extension
        paths = [p.removeprefix("file://") for p in manifest]
        parsed = (
            self.spark.read.text(paths)
            # trim: a whitespace-only separator line is blank, not a
            # malformed record — without it the loud-fail check below
            # would reject the whole batch over a stray " \n"
            .where(F.trim(F.col("value")) != "")
            .select(F.from_json("value", stream.schema).alias("r"))
        )
        # One aggregation pass counts raw non-empty lines AND rows that
        # survived the schema parse. A malformed line becomes a NULL
        # struct under from_json; silently filtering it would shrink the
        # table with no signal — the buffered RECORD path (and the
        # reference SDK) fails loudly on malformed records, so the bulk
        # path must too (at-least-once, never silent loss).
        stats = parsed.agg(
            F.count(F.lit(1)).alias("raw"), F.count("r").alias("ok")
        ).first()
        if stats["ok"] < stats["raw"]:
            raise ValueError(
                f"BATCH for stream {name!r}: {stats['raw'] - stats['ok']} of "
                f"{stats['raw']} lines in {paths} failed to parse under the "
                "stream schema"
            )
        df = parsed.where(F.col("r").isNotNull()).select("r.*")
        self._write_df(stream, df, stats["ok"])

    def _write_df(self, stream: _StreamState, df: DataFrame, n_records: int) -> None:
        if stream.version is not None:
            df = df.withColumn(
                "_sdc_table_version", F.lit(stream.version).cast("long")
            )
        else:
            stream.wrote_untagged = True
        if self.upsert_on_keys and stream.key_properties:
            self.writer.upsert(df, stream.name, stream.key_properties)
        else:
            self.writer.append(df, stream.name)
        stream.records_written += n_records
        stream.batches_written += 1

    def _drain(self, stream: _StreamState) -> None:
        if not stream.buffer:
            return
        add_meta = getattr(self.writer.config, "add_record_metadata", False)
        if add_meta and any(e is not None for e in stream.extracted):
            # attach per-record time_extracted; records lacking it get
            # the drain time (the SDK's `time_extracted or now` default)
            from pyspark.sql.types import StructField

            schema = StructType(
                list(stream.schema.fields)
                + [StructField("_sdc_extracted_at", TimestampType(), True)]
            )
            rows = [
                {**r, "_sdc_extracted_at": e}
                for r, e in zip(stream.buffer, stream.extracted)
            ]
            df = self.spark.createDataFrame(rows, schema=schema).withColumn(
                "_sdc_extracted_at",
                F.coalesce(F.col("_sdc_extracted_at"), F.current_timestamp()),
            )
        else:
            df = self.spark.createDataFrame(stream.buffer, schema=stream.schema)
        n = len(stream.buffer)
        # clear the buffer only AFTER the write succeeds: a transient
        # write failure must leave the records buffered so the caller
        # can retry the drain (at-least-once, never silent loss)
        self._write_df(stream, df, n)
        stream.buffer = []
        stream.extracted = []

    def _drain_all(self) -> None:
        for stream in self.streams.values():
            self._drain(stream)


def demux_singer_file(
    spark: SparkSession, path: str, schemas: dict[str, dict[str, Any]] | None = None
) -> dict[str, DataFrame]:
    """Distributed bulk demux of Singer JSONL file(s).

    ``schemas``: stream -> Singer JSON Schema. When None, SCHEMA
    messages are collected from the file head driver-side (they are a
    handful of lines; the RECORD volume stays distributed).

    Returns one DataFrame per stream, parsed executor-side via
    ``from_json`` — the 100 TB path: no driver buffering, text-splitting
    and JSON parsing scale with executors.
    """
    text = spark.read.text(path)
    if schemas is None:
        # key-order-agnostic: parse the type field, don't prefix-match the
        # serialization (taps order JSON keys however they like)
        schema_rows = bounded_collect(
            text.where(F.get_json_object("value", "$.type") == "SCHEMA"),
            cap=10_000,
            why="one SCHEMA message per Singer stream (streams, not rows)",
            structural=False,
        )
        schemas = {}
        for row in schema_rows:
            msg = json.loads(row["value"])
            schemas[msg["stream"]] = msg["schema"]

    out: dict[str, DataFrame] = {}
    for stream, json_schema in schemas.items():
        struct = json_schema_to_struct_type(json_schema)
        payload = F.get_json_object("value", "$.record")
        records = (
            text.select(F.from_json("value", "type STRING, stream STRING").alias("m"),
                        F.col("value"))
            .where((F.col("m.type") == "RECORD") & (F.col("m.stream") == stream))
            # corrupt RECORD lines (unparseable payload) are dropped here
            # instead of surfacing as all-null rows — the engine's
            # equivalent of the SDK's per-record validation (SURVEY §2 A2)
            .where(payload.isNotNull())
            .select(F.from_json(payload, struct).alias("r"))
            .where(F.col("r").isNotNull())
            .select("r.*")
        )
        out[stream] = records
    return out
