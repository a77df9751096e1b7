"""Crash-injection matrix for the graft_jsonl two-phase commit
protocol (sources/pyds.py; VERDICT r9 task 6).

Round 9 made the protocol attempt-safe and manifest-atomic by LOGIC
(temp names carry taskAttemptId, the manifest rename is the commit
point, replay/orphan cleanup). These tests FAILURE-INJECT it: the
commit state machine is driven directly (executor file writes are
simulated on disk, commit()/abort() run as the driver would), a crash
is injected at every step boundary — temps written / some part files
renamed / manifest missing / manifest present — and after recovery
the reader-visible data must be exactly-once.

Reader-visible = what JsonlReader's glob admits: `*.jsonl` / `*.json`
part files, never `.tmp`, never `_`-prefixed manifests."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from target_iceberg_spark.sources.pyds import (
    JsonlCommit,
    JsonlStreamWriter,
    JsonlWriter,
)

# built programmatically: fromDDL would need a live SparkSession, and
# this matrix deliberately runs WITHOUT one (pure state-machine test)
SCHEMA = StructType(
    [StructField("id", LongType()), StructField("name", StringType())]
)


def _stage(writer, tmpdir, rows, pid=0, attempt=0, tag="part"):
    """Simulate one executor task attempt: write the staged temp file
    exactly as _write_tmp does and return its commit message."""
    tmp = f"{tag}-{writer._job}-{pid:05d}-a{attempt}.jsonl.tmp"
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, tmp), "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(dict(zip(["id", "name"], r))) + "\n")
    return JsonlCommit(tmp_name=tmp, n_rows=len(rows))


def _visible_rows(path):
    """Rows a JsonlReader would see: *.jsonl/*.json part files only
    (no .tmp, no _manifests) — mirrors JsonlReader.partitions()."""
    out = []
    for f in sorted(os.listdir(path)):
        if f.startswith("_") or f.endswith(".tmp"):
            continue
        if not f.endswith((".jsonl", ".json")):
            continue
        with open(os.path.join(path, f)) as fh:
            out.extend(json.loads(line) for line in fh if line.strip())
    return out


def _mk_batch(tmp_path, overwrite=False):
    d = str(tmp_path / "out")
    return JsonlWriter({"path": d}, SCHEMA, overwrite), d


def _mk_stream(tmp_path):
    d = str(tmp_path / "out")
    return JsonlStreamWriter({"path": d}, SCHEMA), d


# ---------------------------------------------------------------------------
# batch writer
# ---------------------------------------------------------------------------


def test_batch_crash_before_commit_invisible(tmp_path):
    """Kill between task writes and commit(): only .tmp litter exists
    and the reader sees nothing."""
    w, d = _mk_batch(tmp_path)
    _stage(w, d, [(1, "a")], pid=0)
    _stage(w, d, [(2, "b")], pid=1)
    assert _visible_rows(d) == []  # crash here: nothing published


def test_batch_abort_drops_all_litter(tmp_path):
    w, d = _mk_batch(tmp_path)
    m0 = _stage(w, d, [(1, "a")], pid=0)
    _stage(w, d, [(2, "b")], pid=1)  # message lost (task died)
    w.abort([m0, None])
    assert _visible_rows(d) == []
    assert [f for f in os.listdir(d) if f.endswith(".tmp")] == []


def test_batch_commit_publishes_winners_only(tmp_path):
    """Speculative/zombie attempts: two attempts of partition 0 staged
    files; only the winner's message reaches commit. Its rows publish
    exactly once and the loser's litter is removed."""
    w, d = _mk_batch(tmp_path)
    win = _stage(w, d, [(1, "a")], pid=0, attempt=7)
    _stage(w, d, [(1, "a")], pid=0, attempt=3)  # zombie, same data
    m1 = _stage(w, d, [(2, "b")], pid=1, attempt=0)
    w.commit([win, m1])
    rows = sorted(_visible_rows(d), key=lambda r: r["id"])
    assert rows == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    assert [f for f in os.listdir(d) if f.endswith(".tmp")] == []


def test_batch_commit_skips_lost_task_messages(tmp_path):
    """A None commit message (task never reported) must not block the
    others nor publish its temp."""
    w, d = _mk_batch(tmp_path)
    m0 = _stage(w, d, [(1, "a")], pid=0)
    _stage(w, d, [(2, "b")], pid=1)
    w.commit([m0, None])
    assert _visible_rows(d) == [{"id": 1, "name": "a"}]


def test_overwrite_publishes_new_before_deleting_old(tmp_path, monkeypatch):
    """Crash MID-DELETE during overwrite: the new job's data and
    manifest are already published, so the reader never observes an
    empty directory — worst case is old+new side by side."""
    w1, d = _mk_batch(tmp_path)
    w1.commit([_stage(w1, d, [(1, "old")], pid=0)])
    assert _visible_rows(d) == [{"id": 1, "name": "old"}]

    w2, _ = _mk_batch(tmp_path)
    w2._overwrite = True
    m = _stage(w2, d, [(2, "new")], pid=0)

    real_remove = os.remove
    calls = {"n": 0}

    def dying_remove(p):
        # let the first old-file delete through, then crash
        calls["n"] += 1
        if calls["n"] >= 2:
            raise OSError("injected crash mid-delete")
        real_remove(p)

    monkeypatch.setattr(os, "remove", dying_remove)
    try:
        w2.commit([m])
    except OSError:
        pass
    monkeypatch.setattr(os, "remove", real_remove)
    rows = _visible_rows(d)
    assert {"id": 2, "name": "new"} in rows  # new data survived the crash
    # re-running the overwrite job to completion converges to new-only
    w3, _ = _mk_batch(tmp_path)
    w3._overwrite = True
    w3.commit([_stage(w3, d, [(2, "new")], pid=0)])
    assert _visible_rows(d) == [{"id": 2, "name": "new"}]


# ---------------------------------------------------------------------------
# streaming writer: every crash point of one epoch, then recovery
# ---------------------------------------------------------------------------


def _renamed_some(writer, d, messages, n_renames):
    """Replicate commit()'s rename sequence, crashing after
    ``n_renames`` part-file renames (before the manifest)."""
    done = 0
    for m in messages:
        if done >= n_renames:
            break
        stamped = m.tmp_name.replace("part-", "part-5-", 1)
        os.rename(os.path.join(d, m.tmp_name), os.path.join(d, stamped))
        done += 1


@pytest.mark.parametrize("crash_point", ["tmps_only", "one_renamed", "all_renamed_no_manifest"])
def test_stream_epoch_replay_is_exactly_once(tmp_path, crash_point):
    """Kill the epoch-5 publish at each boundary short of the manifest
    rename; the checkpoint then REPLAYS the batch with fresh attempt
    temps. Recovery must end with the epoch's rows exactly once."""
    w, d = _mk_stream(tmp_path)
    rows = [[(1, "a")], [(2, "b")]]
    msgs = [_stage(w, d, rows[i], pid=i, attempt=i) for i in range(2)]
    if crash_point == "one_renamed":
        _renamed_some(w, d, msgs, 1)
    elif crash_point == "all_renamed_no_manifest":
        _renamed_some(w, d, msgs, 2)
    # ---- crash; Spark replays batch 5 with new task attempts --------
    w2, _ = _mk_stream(tmp_path)
    w2._path = d
    replay = [_stage(w2, d, rows[i], pid=i, attempt=10 + i) for i in range(2)]
    w2.commit(replay, batchId=5)
    got = sorted(_visible_rows(d), key=lambda r: r["id"])
    assert got == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    assert os.path.exists(os.path.join(d, "_commit-5.json"))


def test_stream_replay_after_full_commit_publishes_nothing(tmp_path):
    """Crash AFTER the manifest rename but before the checkpoint
    records the epoch: the replayed batch finds the manifest, drops
    its temps, publishes nothing — no duplicate rows."""
    w, d = _mk_stream(tmp_path)
    msgs = [_stage(w, d, [(1, "a")], pid=0, attempt=0)]
    w.commit(msgs, batchId=5)
    first = _visible_rows(d)
    assert first == [{"id": 1, "name": "a"}]
    # replay with fresh temps
    w2, _ = _mk_stream(tmp_path)
    replay = [_stage(w2, d, [(1, "a")], pid=0, attempt=9)]
    w2.commit(replay, batchId=5)
    assert _visible_rows(d) == first  # unchanged — exactly once
    assert [f for f in os.listdir(d) if f.endswith(".tmp")] == []


def test_stream_distinct_epochs_accumulate(tmp_path):
    """Sanity: different epochs append; manifests are per-epoch."""
    w, d = _mk_stream(tmp_path)
    w.commit([_stage(w, d, [(1, "a")], pid=0)], batchId=1)
    w2, _ = _mk_stream(tmp_path)
    w2.commit([_stage(w2, d, [(2, "b")], pid=0)], batchId=2)
    got = sorted(_visible_rows(d), key=lambda r: r["id"])
    assert got == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    assert os.path.exists(os.path.join(d, "_commit-1.json"))
    assert os.path.exists(os.path.join(d, "_commit-2.json"))


def test_stream_abort_then_retry_same_epoch(tmp_path):
    """abort() (Spark calls it on task failure before commit) drops
    this attempt set's temps; the retried epoch publishes once."""
    w, d = _mk_stream(tmp_path)
    msgs = [_stage(w, d, [(3, "c")], pid=0, attempt=0)]
    w.abort(msgs, batchId=7)
    assert _visible_rows(d) == []
    w2, _ = _mk_stream(tmp_path)
    w2.commit([_stage(w2, d, [(3, "c")], pid=0, attempt=1)], batchId=7)
    assert _visible_rows(d) == [{"id": 3, "name": "c"}]
