"""Write side of the Python DataSource (sources/pyds.py, round 8):
batch + streaming JSONL sinks with two-phase temp-then-rename commit."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F


def _register(spark):
    from target_iceberg_spark.sources.pyds import JsonlDataSource

    try:
        spark.dataSource.register(JsonlDataSource)
    except Exception:
        pass  # already registered in this session


def test_batch_writer_round_trip_and_commit_protocol(spark, tmp_path):
    _register(spark)
    out = tmp_path / "sink"
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df.write.format("graft_jsonl").option("path", str(out)).mode(
        "append"
    ).save()
    names = os.listdir(out)
    # published parts + one job manifest; NO temp litter
    assert not [n for n in names if n.endswith(".tmp")]
    manifest = [n for n in names if n.startswith("_job-")]
    assert len(manifest) == 1
    files = json.load(open(out / manifest[0]))["files"]
    assert sum(f["n_rows"] for f in files) == 100
    back = (
        spark.read.format("graft_jsonl")
        .schema("k LONG, v LONG")
        .option("path", str(out))
        .load()
    )
    assert {(r["k"], r["v"]) for r in back.collect()} == {
        (i, 2 * i) for i in range(100)
    }


def test_batch_writer_overwrite_replaces_committed_files(spark, tmp_path):
    _register(spark)
    out = tmp_path / "sink_ow"
    a = spark.range(10).select(F.col("id").alias("k"))
    a.write.format("graft_jsonl").option("path", str(out)).mode(
        "append"
    ).save()
    b = spark.range(100, 105).select(F.col("id").alias("k"))
    b.write.format("graft_jsonl").option("path", str(out)).mode(
        "overwrite"
    ).save()
    back = (
        spark.read.format("graft_jsonl")
        .schema("k LONG")
        .option("path", str(out))
        .load()
    )
    assert {r["k"] for r in back.collect()} == set(range(100, 105))


def test_stream_writer_publishes_per_epoch_with_manifest(spark, tmp_path):
    _register(spark)
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"k": list(range(50))}).to_parquet(src / "a.parquet")
    out = tmp_path / "stream_sink"
    q = (
        spark.readStream.schema("k LONG")
        .parquet(str(src))
        .writeStream.format("graft_jsonl")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    names = os.listdir(out)
    assert not [n for n in names if n.endswith(".tmp")]
    manifests = [n for n in names if n.startswith("_commit-")]
    assert manifests, names
    back = (
        spark.read.format("graft_jsonl")
        .schema("k LONG")
        .option("path", str(out))
        .load()
    )
    assert {r["k"] for r in back.collect()} == set(range(50))
    # epoch is stamped into published part names
    assert all(
        n.startswith("part-") for n in names if n.endswith(".jsonl")
    )


def test_stream_writer_replayed_epoch_does_not_duplicate(spark, tmp_path):
    """Simulate a replay of an ALREADY-COMMITTED micro-batch: commit()
    must find the epoch manifest, drop the replayed temps, and publish
    nothing new."""
    from pyspark.sql.types import StructType

    from target_iceberg_spark.sources.pyds import (
        JsonlCommit,
        JsonlStreamWriter,
    )

    out = tmp_path / "replay_sink"
    out.mkdir()
    schema = StructType.fromDDL("k LONG")
    w = JsonlStreamWriter({"path": str(out)}, schema)
    # epoch 7 already committed
    (out / "_commit-7.json").write_text('{"files": []}')
    # a replayed task's temp
    tmp = f"part-{w._job}-00000.jsonl.tmp"
    (out / tmp).write_text('{"k": 1}\n')
    w.commit([JsonlCommit(tmp_name=tmp, n_rows=1)], 7)
    names = os.listdir(out)
    assert tmp not in names  # temp dropped
    assert not [n for n in names if n.endswith(".jsonl")]  # nothing published


def test_staged_names_include_task_attempt_id(spark, tmp_path):
    """ADVICE r9: two live attempts of the same task (speculation,
    zombie-after-retry) must never share a staged file — the attempt
    id is part of the name, visible in the published files."""
    import re

    _register(spark)
    out = tmp_path / "sink_attempt"
    spark.range(20).select(F.col("id").alias("k")).repartition(4).write.format(
        "graft_jsonl"
    ).option("path", str(out)).mode("append").save()
    parts = [n for n in os.listdir(out) if n.endswith(".jsonl")]
    assert parts
    pat = re.compile(r"^part-[0-9a-f]{12}-\d{5}-a\d+\.jsonl$")
    assert all(pat.match(n) for n in parts), parts


def test_stream_commit_removes_orphans_of_crashed_publish(spark, tmp_path):
    """ADVICE r9: a crash mid-publish (some part-<epoch>-* renamed,
    manifest not yet written) must not double rows on replay — the
    replayed commit deletes the orphaned, manifest-less part files
    before publishing its own."""
    from pyspark.sql.types import StructType

    from target_iceberg_spark.sources.pyds import (
        JsonlCommit,
        JsonlStreamWriter,
    )

    out = tmp_path / "orphan_sink"
    out.mkdir()
    w = JsonlStreamWriter({"path": str(out)}, StructType.fromDDL("k LONG"))
    # epoch 3's first attempt crashed after renaming one part file but
    # BEFORE writing _commit-3.json:
    (out / "part-3-deadbeef0000-00000-a1.jsonl").write_text('{"k": 1}\n')
    # the replay writes its own temp and commits
    tmp = f"part-{w._job}-00000-a2.jsonl.tmp"
    (out / tmp).write_text('{"k": 1}\n')
    w.commit([JsonlCommit(tmp_name=tmp, n_rows=1)], 3)
    names = os.listdir(out)
    published = [n for n in names if n.endswith(".jsonl")]
    assert len(published) == 1  # the orphan is gone, not doubled
    assert published[0].startswith("part-3-") and w._job in published[0]
    manifest = json.load(open(out / "_commit-3.json"))
    assert [f["file"] for f in manifest["files"]] == published
    # the manifest was renamed into place — no manifest temp litter
    assert not [n for n in names if n.endswith(".tmp")]


def test_overwrite_publishes_before_deleting_and_keeps_manifest(
    spark, tmp_path
):
    """ADVICE r9: overwrite is new-first/delete-after — after commit,
    exactly the new job's parts + manifest remain (old data and old
    manifests gone), and the manifest lists every published file."""
    _register(spark)
    out = tmp_path / "sink_ow2"
    spark.range(10).select(F.col("id").alias("k")).write.format(
        "graft_jsonl"
    ).option("path", str(out)).mode("append").save()
    old_manifests = {n for n in os.listdir(out) if n.startswith("_job-")}
    spark.range(100, 103).select(F.col("id").alias("k")).write.format(
        "graft_jsonl"
    ).option("path", str(out)).mode("overwrite").save()
    names = set(os.listdir(out))
    assert not (old_manifests & names)  # old job manifest removed
    new_manifest = [n for n in names if n.startswith("_job-")]
    assert len(new_manifest) == 1
    listed = {
        f["file"] for f in json.load(open(out / new_manifest[0]))["files"]
    }
    assert listed == {n for n in names if n.endswith(".jsonl")}
    back = (
        spark.read.format("graft_jsonl")
        .schema("k LONG")
        .option("path", str(out))
        .load()
    )
    assert {r["k"] for r in back.collect()} == {100, 101, 102}
