"""Partitioned-write tests: the engine's scale extension over the
reference's always-unpartitioned tables (reference sinks.py:96)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from target_iceberg_spark.sources.tables import load_table
from target_iceberg_spark.writer import StreamWriter, WriterConfig


def test_partitioned_append_layout_and_pruning(spark, sf_smoke, tmp_path):
    writer = StreamWriter(
        spark,
        WriterConfig(warehouse=str(tmp_path), partition_by=("event_date",)),
        mode="parquet",
    )
    ev = load_table(spark, sf_smoke, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    writer.append(ev, "events_by_day")

    # hive-style partition directories on disk
    table_dir = writer.table_path("events_by_day")
    parts = [d for d in os.listdir(table_dir) if d.startswith("event_date=")]
    assert len(parts) == 30  # January 2024 has 30 distinct event days here

    # a date-filtered read prunes partitions at planning time
    back = writer.read("events_by_day").where(F.col("event_date") == "2024-01-05")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan
    assert back.count() == ev.where(F.col("event_date") == "2024-01-05").count()


def test_partitioned_overwrite_roundtrip(spark, sf_smoke, tmp_path):
    writer = StreamWriter(
        spark,
        WriterConfig(warehouse=str(tmp_path), partition_by=("lang",)),
        mode="parquet",
    )
    docs = load_table(spark, sf_smoke, "documents")
    writer.append(docs, "docs_by_lang")
    writer.overwrite(docs.where(F.col("lang") == "en"), "docs_by_lang")
    langs = {r["lang"] for r in writer.read("docs_by_lang").select("lang").distinct().collect()}
    assert langs == {"en"}
