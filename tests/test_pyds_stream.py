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


def _mk_reader(src, **opts):
    from pyspark.sql.types import StructType

    from target_iceberg_spark.sources.pyds import JsonlReplayStreamReader

    schema = StructType.fromDDL("k int, v string")
    return JsonlReplayStreamReader(
        {"path": str(src), "filesPerBatch": "2", **opts}, schema
    )


def test_jsonl_stream_offsets_keyed_by_name_not_position(tmp_path):
    """The round-6 advisor's scenario: after files are committed, a
    file lands whose name sorts BEFORE them. Name-keyed offsets must
    neither re-deliver committed files nor skip genuinely-new ones;
    the late file itself is skipped per the documented contract
    (positional offsets would shift and re-deliver '10.jsonl')."""
    src = tmp_path / "drop"
    src.mkdir()
    _write(src, "10.jsonl", [{"k": 10, "v": "a"}])
    _write(src, "20.jsonl", [{"k": 20, "v": "a"}])
    r = _mk_reader(src)
    rows, off1 = r.read(r.initialOffset())
    assert [t[0] for t in rows] == [10, 20]
    assert off1["last_file"] == "20.jsonl"

    # late file sorting before the watermark + one genuinely new file
    _write(src, "05.jsonl", [{"k": 5, "v": "late"}])
    _write(src, "30.jsonl", [{"k": 30, "v": "b"}])
    rows, off2 = r.read(off1)
    got = [t[0] for t in rows]
    assert got == [30], f"expected only the new file's rows, got {got}"

    # replay of the committed batch is pinned — the late file cannot
    # perturb it
    replayed = [t[0] for t in r.readBetweenOffsets(r.initialOffset(), off1)]
    assert replayed == [10, 20]


def test_jsonl_stream_late_file_skip_policy_warns(tmp_path):
    """Regression (round-7 ADVICE): under the default
    lateFilePolicy='skip' the violation must be SURFACED, not silent —
    a RuntimeWarning carries the same message the error policy raises,
    so log review can detect dropped late-name files."""
    import warnings

    src = tmp_path / "drop"
    src.mkdir()
    _write(src, "10.jsonl", [{"k": 10, "v": "a"}])
    r = _mk_reader(src)  # default policy: skip
    _, off1 = r.read(r.initialOffset())
    _write(src, "05.jsonl", [{"k": 5, "v": "late"}])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows, _ = r.read(off1)
    assert [t[0] for t in rows] == []  # late file still skipped
    hits = [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert hits and "watermark" in str(hits[0].message)


def test_jsonl_stream_late_file_policy_error(tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    _write(src, "10.jsonl", [{"k": 10, "v": "a"}])
    r = _mk_reader(src, lateFilePolicy="error")
    _, off1 = r.read(r.initialOffset())
    _write(src, "05.jsonl", [{"k": 5, "v": "late"}])
    import pytest

    with pytest.raises(RuntimeError, match="watermark"):
        r.read(off1)


def test_jsonl_stream_accepts_legacy_positional_offsets(tmp_path):
    """Pre-round-7 checkpoints stored {'file_idx': n}; the reader maps
    them onto the current sorted listing (sound under the monotonic
    naming the old format required) and continues with name-keyed
    offsets from there."""
    src = tmp_path / "drop"
    src.mkdir()
    for i in range(3):
        _write(src, f"{i:02d}.jsonl", [{"k": i, "v": "a"}])
    r = _mk_reader(src)
    rows, off = r.read({"file_idx": 2})
    assert [t[0] for t in rows] == [2]
    assert off["last_file"] == "02.jsonl"
    replayed = [t[0] for t in r.readBetweenOffsets({"file_idx": 0}, {"file_idx": 2})]
    assert replayed == [0, 1]
