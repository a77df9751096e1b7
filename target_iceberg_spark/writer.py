"""Stream -> table sink: idempotent DDL + append/upsert/overwrite.

Re-expresses the reference's sink pipeline (reference sinks.py:36-100)
on Spark's writer stack:

  reference                               engine
  ---------------------------------------+--------------------------------
  load_catalog per batch (sinks.py:43-65)| session-scoped catalog conf,
                                         |   connected once (SURVEY §4)
  create_namespace + error swallow       | CREATE NAMESPACE IF NOT EXISTS /
    (sinks.py:67-77)                     |   mkdir (parquet mode)
  load-or-create table (sinks.py:88-97)  | ensure_table(): CREATE IF ABSENT,
                                         |   with optional partition spec
                                         |   (reference creates unpartitioned)
  table.append(arrow) (sinks.py:100)     | df.writeTo(...).append() /
                                         |   write.parquet(mode=append)
  key_properties accepted, unused        | upsert(): MERGE-style last-wins
    (sinks.py:25,31 — append-only)       |   (engine extension)
  ACTIVATE_VERSION ignored (target.py:6) | overwrite(): full refresh

Two physical modes behind one API:
  - **iceberg**: when an Iceberg Spark catalog is on the classpath the
    writer uses `writeTo(catalog.ns.table)` append/create and SQL MERGE.
  - **parquet** (default here): a plain parquet warehouse directory
    `{warehouse}/{namespace}/{stream}/` — the local test environment
    ships no Iceberg runtime jar, and correctness must not depend on
    network jars. Upsert/overwrite rewrite via a temp dir + directory
    swap (Iceberg gives real snapshot atomicity; the parquet fallback
    is best-effort and documents that).

At 100 TB: appends should land partitioned (pass ``partition_by`` —
e.g. a day-bucketed column) so downstream scans prune; the reference
always creates unpartitioned tables (sinks.py:96).
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def iceberg_available(spark: SparkSession, catalog: str = "lakehouse") -> bool:
    """True when the Iceberg Spark runtime is usable: the class is on the
    JVM classpath AND the named catalog is actually configured. The class
    check alone proves the jar exists, not that `catalog.ns.table`
    identifiers resolve — without the conf, DDL would fail at
    construction time."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
    except Exception:
        return False
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
    except Exception:
        return False


@dataclass
class WriterConfig:
    """Engine equivalent of the reference's config surface
    (reference target.py:15-59): warehouse location + namespace +
    metadata flag; catalog name only meaningful in iceberg mode."""

    warehouse: str
    namespace: str = "default"
    catalog: str = "lakehouse"
    add_record_metadata: bool = False  # reference target.py:16 (default False)
    partition_by: tuple[str, ...] = field(default_factory=tuple)


class StreamWriter:
    def __init__(self, spark: SparkSession, config: WriterConfig, mode: str = "auto"):
        self.spark = spark
        self.config = config
        if mode == "auto":
            mode = "iceberg" if iceberg_available(spark, config.catalog) else "parquet"
        if mode not in ("iceberg", "parquet"):
            raise ValueError(f"unknown writer mode: {mode}")
        self.mode = mode
        self._batch_seq = 0
        self.ensure_namespace()

    # -- identifiers -----------------------------------------------------
    def table_identifier(self, stream: str) -> str:
        """Table name == stream name (reference sinks.py:85-86)."""
        return f"{self.config.catalog}.{self.config.namespace}.{stream}"

    def table_path(self, stream: str) -> str:
        return os.path.join(self.config.warehouse, self.config.namespace, stream)

    # -- DDL -------------------------------------------------------------
    def ensure_namespace(self) -> None:
        """Reference sinks.py:67-77 (create_namespace + swallow-exists)."""
        if self.mode == "iceberg":
            self.spark.sql(
                f"CREATE NAMESPACE IF NOT EXISTS {self.config.catalog}.{self.config.namespace}"
            )
        else:
            os.makedirs(os.path.join(self.config.warehouse, self.config.namespace), exist_ok=True)

    def table_exists(self, stream: str) -> bool:
        if self.mode == "iceberg":
            return self.spark.catalog.tableExists(self.table_identifier(stream))
        path = self.table_path(stream)
        if not os.path.isdir(path):
            return False
        # recursive: partitioned tables keep data under key=value/ subdirs
        return any(
            f.endswith(".parquet")
            for _, _, files in os.walk(path)
            for f in files
        )

    # -- record metadata (reference A12, SDK-inherited) ------------------
    def _with_metadata(self, df: DataFrame) -> DataFrame:
        if not self.config.add_record_metadata:
            return df
        self._batch_seq += 1
        return (
            df.withColumn("_sdc_received_at", F.current_timestamp())
            .withColumn("_sdc_batched_at", F.current_timestamp())
            .withColumn("_sdc_sequence", F.lit(self._batch_seq).cast("long"))
        )

    # -- writes ----------------------------------------------------------
    def append(self, df: DataFrame, stream: str) -> None:
        """Append-only batch commit (reference sinks.py:88-100: load-or-
        create then table.append). Duplicate keys are persisted as-is,
        matching the reference's unused key_properties."""
        df = self._with_metadata(df)
        if self.mode == "iceberg":
            ident = self.table_identifier(stream)
            if not self.table_exists(stream):
                w = df.writeTo(ident)
                if self.config.partition_by:
                    w = w.partitionedBy(*[F.col(c) for c in self.config.partition_by])
                w.create()
            else:
                # merge-schema lets an evolved stream add columns without
                # manual ALTER TABLE (reference TODO at sinks.py:92)
                df.writeTo(ident).option("merge-schema", "true").append()
        else:
            writer = df.write.mode("append")
            if self.config.partition_by:
                writer = writer.partitionBy(*self.config.partition_by)
            writer.parquet(self.table_path(stream))

    @staticmethod
    def _dedupe_batch(df: DataFrame, key_properties: list[str]) -> DataFrame:
        """Keep the LAST row per key within one batch (arrival order ==
        row order in the buffered DataFrame; monotonically_increasing_id
        is ascending in that order). Required before MERGE — multiple
        source matches per target row are an error in Iceberg — and for
        deterministic last-write-wins in the parquet path."""
        w = Window.partitionBy(*key_properties).orderBy(F.desc("_upsert_seq"))
        return (
            df.withColumn("_upsert_seq", F.monotonically_increasing_id())
            .withColumn("_upsert_rn", F.row_number().over(w))
            .where(F.col("_upsert_rn") == 1)
            .drop("_upsert_rn", "_upsert_seq")
        )

    def upsert(self, df: DataFrame, stream: str, key_properties: list[str]) -> None:
        """Last-write-wins merge on the Singer key_properties — the
        engine extension fixing the reference's silent append-only
        handling of keyed streams (reference sinks.py:25,100)."""
        if not key_properties:
            raise ValueError("upsert requires non-empty key_properties")
        df = self._dedupe_batch(self._with_metadata(df), key_properties)
        if self.mode == "iceberg":
            ident = self.table_identifier(stream)
            if not self.table_exists(stream):
                w = df.writeTo(ident)
                if self.config.partition_by:
                    w = w.partitionedBy(*[F.col(c) for c in self.config.partition_by])
                w.create()
                return
            view = f"_upsert_src_{uuid.uuid4().hex[:8]}"
            df.createOrReplaceTempView(view)
            try:
                on = " AND ".join(f"t.{k} = s.{k}" for k in key_properties)
                self.spark.sql(
                    f"MERGE INTO {ident} t USING {view} s ON {on} "
                    "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
                )
            finally:
                self.spark.catalog.dropTempView(view)
            return
        # parquet mode: union + keep newest row per key, then swap dirs.
        df = df.withColumn("_upsert_gen", F.lit(1))
        if self.table_exists(stream):
            existing = self.read(stream).withColumn("_upsert_gen", F.lit(0))
            df = existing.unionByName(df, allowMissingColumns=True)
        w = Window.partitionBy(*key_properties).orderBy(F.desc("_upsert_gen"))
        deduped = (
            df.withColumn("_upsert_rn", F.row_number().over(w))
            .where(F.col("_upsert_rn") == 1)
            .drop("_upsert_rn", "_upsert_gen")
        )
        self._swap_write(deduped, stream)

    def delete_where(self, stream: str, condition: str) -> None:
        """Delete rows matching a SQL condition (used by ACTIVATE_VERSION
        to retire rows of superseded table versions)."""
        if not self.table_exists(stream):
            return
        if self.mode == "iceberg":
            self.spark.sql(
                f"DELETE FROM {self.table_identifier(stream)} WHERE {condition}"
            )
            return
        kept = self.read(stream).where(f"NOT ({condition})")
        self._swap_write(kept, stream)

    def overwrite(self, df: DataFrame, stream: str) -> None:
        """Full-refresh semantics — what Singer ACTIVATE_VERSION implies;
        the reference parses the message but never acts on it
        (SURVEY §2 A16)."""
        df = self._with_metadata(df)
        if self.mode == "iceberg":
            df.writeTo(self.table_identifier(stream)).createOrReplace()
        else:
            self._swap_write(df, stream)

    def _swap_write(self, df: DataFrame, stream: str) -> None:
        path = self.table_path(stream)
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if self.config.partition_by:
            writer = writer.partitionBy(*self.config.partition_by)
        writer.parquet(tmp)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    def compact(self, stream: str, target_file_mb: int = 128) -> int:
        """Small-files maintenance: rewrite the table into
        ceil(bytes / target_file_mb) files. Streaming appends produce one
        file per micro-batch partition; at 100 TB that means millions of
        tiny parquet files unless compacted (Iceberg mode would use
        rewrite_data_files; the parquet warehouse coalesces + swaps).
        Returns the file count after compaction."""
        if self.mode == "iceberg":
            self.spark.sql(
                "CALL "
                f"{self.config.catalog}.system.rewrite_data_files('"
                f"{self.config.namespace}.{stream}')"
            )
            return -1  # Iceberg tracks its own file inventory
        path = self.table_path(stream)
        total_bytes = sum(
            os.path.getsize(os.path.join(dirpath, f))
            for dirpath, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
        df = self.read(stream).coalesce(int(n_files))
        self._swap_write(df, stream)
        return sum(
            1
            for dirpath, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

    # -- reads -----------------------------------------------------------
    def read(self, stream: str) -> DataFrame:
        if self.mode == "iceberg":
            return self.spark.table(self.table_identifier(stream))
        # mergeSchema: batches appended under an evolved (wider) stream
        # schema surface every column; pre-evolution rows read as NULL
        # in the added columns. This is the engine's answer to the
        # reference's open TODO "Handle schema evolution" (sinks.py:92).
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.table_path(stream)
        )
