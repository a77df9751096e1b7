"""Python streaming DataSource (sources/pyds.py::JsonlReplayStreamSource):
micro-batch replay of a JSONL drop folder with checkpointed offsets —
exactly-once across restarts, filesPerBatch pacing, deterministic file
order."""

from __future__ import annotations

import json


def _write(dirpath, name, rows):
    with open(dirpath / name, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run_available_now(spark, src, ckpt, sink_rows):
    from target_iceberg_spark.sources.pyds import JsonlReplayStreamSource

    spark.dataSource.register(JsonlReplayStreamSource)
    stream = (
        spark.readStream.format("graft_jsonl_stream")
        .schema("k int, v string")
        .option("path", str(src))
        .option("filesPerBatch", "2")
        .load()
    )

    def sink(df, batch_id):
        rows = df.collect()
        if rows:
            sink_rows.append((batch_id, sorted((r.k, r.v) for r in rows)))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_jsonl_stream_replays_files_in_paced_batches(spark, tmp_path):
    """Spark's PythonMicroBatchStream does not support AvailableNow
    catch-up (it falls back to single-batch execution — observed
    warning), so each run consumes exactly ONE read() batch of
    filesPerBatch files; successive runs on the same checkpoint walk
    the folder in sorted order until exhausted."""
    src = tmp_path / "drop"
    src.mkdir()
    for i in range(5):
        _write(src, f"{i:02d}.jsonl", [{"k": i * 10 + j, "v": f"r{i}"} for j in range(3)])

    per_run = []
    for _ in range(4):
        got: list = []
        _run_available_now(spark, src, tmp_path / "ckpt", got)
        per_run.append(sorted(r for _, b in got for r in b))

    # pacing: 2 files -> 2 files -> 1 file -> nothing
    assert [len(r) for r in per_run] == [6, 6, 3, 0]
    all_rows = sorted(r for run in per_run for r in run)
    expect = sorted(
        (i * 10 + j, f"r{i}") for i in range(5) for j in range(3)
    )
    assert all_rows == expect  # every row exactly once, in file order


def test_jsonl_stream_resumes_from_checkpoint_without_replay(spark, tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    for i in range(2):
        _write(src, f"{i:02d}.jsonl", [{"k": i, "v": "a"}])

    first: list = []
    _run_available_now(spark, src, tmp_path / "ckpt", first)
    assert sorted(r for _, b in first for r in b) == [(0, "a"), (1, "a")]

    # a new file lands; a SECOND availableNow run on the same
    # checkpoint must deliver ONLY the new file's rows
    _write(src, "02.jsonl", [{"k": 2, "v": "b"}])
    second: list = []
    _run_available_now(spark, src, tmp_path / "ckpt", second)
    assert sorted(r for _, b in second for r in b) == [(2, "b")]
