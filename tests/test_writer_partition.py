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


def _file_ranges(table_dir, column):
    """Per-parquet-file (min, max) of `column` from the footer stats."""
    import pyarrow.parquet as pq

    ranges = []
    for dirpath, _, files in os.walk(table_dir):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(dirpath, f)).metadata
            lo = hi = None
            for rg in range(meta.num_row_groups):
                row_group = meta.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema == column and col.statistics:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                ranges.append((lo, hi))
    return sorted(ranges)


def _assert_disjoint(ranges):
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_sort_order_write_clusters_files(spark, sf_smoke, tmp_path):
    """sort_by clustering (the Iceberg SORT ORDER analogue): every file
    covers a disjoint sort-key range, so range predicates can skip whole
    files from footer min/max alone — the data-skipping property that
    matters at 100 TB."""
    writer = StreamWriter(
        spark,
        WriterConfig(warehouse=str(tmp_path), sort_by=("ts",)),
        mode="parquet",
    )
    ev = load_table(spark, sf_smoke, "events")
    # at this toy size AQE correctly coalesces the range shuffle to one
    # partition (it targets advisory partition bytes); pin it off so the
    # fan-out + disjointness mechanism is observable
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        writer.append(ev, "events_sorted")
    finally:
        spark.conf.set(coalesce_key, old)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    table_dir = writer.table_path("events_sorted")
    ranges = _file_ranges(table_dir, "ts")
    assert len(ranges) > 1  # range partitioner actually fanned out
    _assert_disjoint(ranges)
    assert writer.read("events_sorted").count() == ev.count()


def test_compact_preserves_sort_order_clustering(spark, sf_smoke, tmp_path):
    writer = StreamWriter(
        spark,
        WriterConfig(warehouse=str(tmp_path), sort_by=("ts",)),
        mode="parquet",
    )
    ev = load_table(spark, sf_smoke, "events")
    # two appends = two clustered generations whose ranges overlap
    writer.append(ev, "ev")
    writer.append(ev, "ev")
    n_before = writer.read("ev").count()

    n_files = writer.compact("ev", target_file_mb=1)
    assert n_files >= 1
    ranges = _file_ranges(writer.table_path("ev"), "ts")
    assert len(ranges) == n_files
    _assert_disjoint(ranges)  # compaction re-clustered, not just coalesced
    assert writer.read("ev").count() == n_before
