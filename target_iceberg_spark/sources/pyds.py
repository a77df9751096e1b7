"""Spark 4 Python DataSource: a JSON-lines batch connector.

The reference ingests Singer JSONL from stdin; this is the same wire
format exposed as a first-class *pluggable Spark source* through the
public Python DataSource API (SPARK-44076, Spark 4) — the mechanism a
PySpark-native engine uses to host custom connectors (SaaS APIs,
proprietary formats, message logs) without JVM code. The reader is
split-parallel at file granularity: `partitions()` lists the files,
and each `read(partition)` runs inside an executor's Python worker,
parsing only its own file — the same executor-side discipline as the
mapInPandas stages (bytes never funnel through the driver).

Deliberately schema-EXPLICIT (the caller passes the DDL): schema
inference over JSONL costs a full extra pass at 100 TB and silently
widens types; an explicit schema makes malformed values an error at
parse time on the executor, matching the engine's scan_jsonl policy.
"""

from __future__ import annotations

import json
import os
import warnings
from collections.abc import Iterator

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class JsonlDataSource(DataSource):
    """``spark.read.format("graft_jsonl").schema(ddl).option("path", dir)``.

    Options:
      path — directory containing ``*.json``/``*.jsonl`` part files
             (a Spark json-writer output dir works as-is).
    """

    @classmethod
    def name(cls) -> str:
        return "graft_jsonl"

    def schema(self):  # pragma: no cover - Spark calls only if no schema
        raise ValueError(
            "graft_jsonl requires an explicit schema (.schema(ddl)): "
            "inference would cost an extra full pass and widen types"
        )

    def reader(self, schema) -> "JsonlReader":
        return JsonlReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonlStreamWriter":
        return JsonlStreamWriter(self.options, schema)


class JsonlReader(DataSourceReader):
    def __init__(self, options, schema) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("graft_jsonl: 'path' option is required")
        self._path = path
        self._fields = [f.name for f in schema.fields]

    def partitions(self) -> list[InputPartition]:
        # one split per part file — executors parse files in parallel;
        # sorted so partition planning is deterministic
        # metadata files (_job-*/_commit-* manifests, _SUCCESS-style
        # markers) and hidden files are never data — the same
        # underscore convention Spark's own file sources use
        files = sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith((".json", ".jsonl"))
            and not f.startswith(("_", "."))
        )
        if not files:
            raise FileNotFoundError(
                f"graft_jsonl: no *.json/*.jsonl files under {self._path}"
            )
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # runs IN the executor's Python worker: parse only this file
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                obj = json.loads(line)
                yield tuple(obj.get(f) for f in self._fields)


class JsonlReplayStreamSource(DataSource):
    """Streaming twin of :class:`JsonlDataSource`: replays a JSONL
    directory as a micro-batched stream, ``filesPerBatch`` files per
    batch in sorted order — the drop-folder / backfill-replay
    connector, built on Spark 4's ``SimpleDataSourceStreamReader``.

    Offsets are keyed by FILENAME, not list position:
    ``{"last_file": name, "batch": [names...]}`` where ``last_file``
    is the high-water mark (last consumed basename) and ``batch`` pins
    the exact files of the batch that ended at this offset. That makes
    the source REPLAYABLE even if the directory listing changes
    between plan and replay: ``readBetweenOffsets(start, end)``
    re-parses exactly ``end["batch"]``, so a failed micro-batch
    re-executes with identical rows — the exactly-once contract a
    checkpointed Structured Streaming query requires from its source.
    (A positional ``{"file_idx": n}`` offset — the pre-round-7 format,
    still accepted from old checkpoints — would shift if a file later
    landed with a name sorting before committed files, silently
    skipping or re-delivering rows.)

    Late-arrival contract: a file whose name sorts BEFORE the
    committed high-water mark is SKIPPED (drop folders are expected to
    use monotonic names — timestamps, sequence numbers; Spark's own
    file source keys on seen-file sets for the same reason). The
    reader counts files at-or-below the watermark each batch and
    raises on ``lateFilePolicy=error`` (default ``skip``) so the
    violation is detectable rather than silent.

    Caveat (observed, pinned in tests/test_pyds_stream.py): Spark's
    PythonMicroBatchStream does not implement AvailableNow catch-up —
    it falls back to single-batch execution, so one
    ``trigger(availableNow=True)`` run consumes ONE ``read()`` batch;
    drain a backlog with repeated runs on the same checkpoint (each
    resumes from the committed offset) or a processing-time trigger.
    """

    @classmethod
    def name(cls) -> str:
        return "graft_jsonl_stream"

    def schema(self):  # pragma: no cover - Spark calls only if no schema
        raise ValueError(
            "graft_jsonl_stream requires an explicit schema (.schema(ddl))"
        )

    def simpleStreamReader(self, schema) -> "JsonlReplayStreamReader":
        return JsonlReplayStreamReader(self.options, schema)


class JsonlReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, schema) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("graft_jsonl_stream: 'path' option is required")
        self._path = path
        self._fields = [f.name for f in schema.fields]
        self._per_batch = int(options.get("filesPerBatch", 2))
        policy = options.get("lateFilePolicy", "skip")
        if policy not in ("skip", "error"):
            raise ValueError(
                "graft_jsonl_stream: lateFilePolicy must be 'skip' or "
                f"'error', got {policy!r}"
            )
        self._late_error = policy == "error"

    def _names(self) -> list[str]:
        return sorted(
            f
            for f in os.listdir(self._path)
            if f.endswith((".json", ".jsonl"))
            and not f.startswith(("_", "."))  # skip manifests/markers
        )

    def _last_name(self, offset: dict, names: list[str]) -> str:
        if "last_file" in offset:
            return offset["last_file"]
        # legacy positional offset from a pre-round-7 checkpoint:
        # interpret against the CURRENT sorted listing (exact when
        # names are monotonic, the only regime the old format was
        # sound in anyway)
        i = int(offset.get("file_idx", 0))
        return names[i - 1] if 0 < i <= len(names) else ""

    def _parse(self, files: list[str]) -> list[tuple]:
        rows = []
        for path in files:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    obj = json.loads(line)
                    rows.append(tuple(obj.get(f) for f in self._fields))
        return rows

    def initialOffset(self) -> dict:
        return {"last_file": "", "batch": [], "n_at_or_below": 0}

    def read(self, start: dict):
        names = self._names()
        last = self._last_name(start, names)
        n_below = sum(1 for n in names if n <= last)
        if n_below > start.get("n_at_or_below", n_below):
            # a file landed with a name sorting at/below the committed
            # high-water mark — it will never be delivered
            msg = (
                "graft_jsonl_stream: file(s) arrived sorting at or "
                f"below the committed watermark {last!r}; late files "
                "are skipped — use monotonic names (lateFilePolicy)"
            )
            if self._late_error:
                raise RuntimeError(msg)
            # policy='skip': still surface the violation — silent
            # drops are undetectable in production log review
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        batch = [n for n in names if n > last][: self._per_batch]
        end = {
            "last_file": batch[-1] if batch else last,
            "batch": batch,
            "n_at_or_below": n_below + len(batch),
        }
        files = [os.path.join(self._path, n) for n in batch]
        return iter(self._parse(files)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        if "batch" in end:
            # replay the PINNED file list — immune to listing changes
            names = end["batch"]
        else:  # legacy positional offsets
            all_names = self._names()
            lo = self._last_name(start, all_names)
            hi = self._last_name(end, all_names)
            names = [n for n in all_names if lo < n <= hi]
        return iter(self._parse([os.path.join(self._path, n) for n in names]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — files are the durable log


# ---------------------------------------------------------------------------
# Write side (round 8): batch + streaming JSONL sinks with two-phase
# commit — the full Spark 4 Python DataSource surface (SPARK-44076).
# ---------------------------------------------------------------------------


@dataclass
class JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the temp file the task wrote and its
    row count. Temps use a `.tmp` suffix the reader's `*.json(l)` glob
    never matches, so uncommitted output is invisible by construction."""

    tmp_name: str
    n_rows: int


class _JsonlWriterBase:
    """Shared two-phase-commit mechanics.

    Executors write to `<dir>/<name>.tmp` and return the temp name;
    the DRIVER renames temps to `part-*.jsonl` in commit() — the same
    stage-then-publish discipline as operators/ivf.py's index build.
    A crash between write and commit leaves only `.tmp` litter that no
    reader sees and the next abort/cleanup may remove; rename is the
    atomic publish."""

    def __init__(self, options, schema) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("graft_jsonl writer: 'path' option is required")
        self._path = path
        self._fields = [f.name for f in schema.fields]
        import uuid

        self._job = uuid.uuid4().hex[:12]  # driver-chosen, shipped via pickle

    def _write_tmp(self, iterator, tag: str) -> JsonlCommit:
        # runs IN the executor's Python worker
        import json as _json
        import os as _os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # the ATTEMPT id is part of the staged name (like Spark's own
        # file sinks): two live attempts of the same task (speculation,
        # zombie-after-retry) must never share a file, or their writes
        # interleave; commit() publishes only the files the WINNING
        # attempts named in their commit messages
        attempt = ctx.taskAttemptId()
        tmp = f"{tag}-{self._job}-{pid:05d}-a{attempt}.jsonl.tmp"
        n = 0
        _os.makedirs(self._path, exist_ok=True)
        with open(_os.path.join(self._path, tmp), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    _json.dumps(
                        dict(zip(self._fields, row)), default=str
                    )
                )
                fh.write("\n")
                n += 1
        return JsonlCommit(tmp_name=tmp, n_rows=n)

    def _publish(self, messages, manifest_name: str) -> list:
        import json as _json
        import os as _os

        published = []
        for m in messages:
            if m is None:
                continue
            final = m.tmp_name[: -len(".tmp")]
            _os.rename(
                _os.path.join(self._path, m.tmp_name),
                _os.path.join(self._path, final),
            )
            published.append({"file": final, "n_rows": m.n_rows})
        # the manifest itself is written temp-then-rename so it either
        # exists complete or not at all — it is the atomic commit point
        # the streaming replay check and overwrite cleanup key on
        mtmp = _os.path.join(self._path, manifest_name + ".tmp")
        with open(mtmp, "w") as fh:
            _json.dump({"files": published}, fh)
        _os.rename(mtmp, _os.path.join(self._path, manifest_name))
        return published

    def _drop_job_litter(self) -> None:
        """Remove leftover `.tmp` files of THIS job (losing/zombie task
        attempts whose messages never reached commit). Safe even if a
        zombie is still writing: unlink leaves it writing an orphaned
        inode that vanishes on close."""
        import os as _os

        for f in _os.listdir(self._path):
            if f.endswith(".jsonl.tmp") and f"-{self._job}-" in f:
                try:
                    _os.remove(_os.path.join(self._path, f))
                except FileNotFoundError:
                    pass

    def _drop_tmps(self, messages) -> None:
        import os as _os

        for m in messages:
            if m is None:
                continue
            try:
                _os.remove(_os.path.join(self._path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlWriter(_JsonlWriterBase, DataSourceWriter):
    """Batch sink: `df.write.format("graft_jsonl").option("path", d)`.

    mode("overwrite") PUBLISHES the new part files first and only then
    deletes the old ones (distinguishable by job uuid) — a crash at
    any point leaves either the old data intact (before publish) or
    old+new side by side (mid-delete, re-runnable), never an empty
    directory; mode("append") publishes alongside them."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        super().__init__(options, schema)
        self._overwrite = overwrite

    def write(self, iterator):
        return self._write_tmp(iterator, "part")

    def commit(self, messages) -> None:
        import os as _os

        self._publish(messages, f"_job-{self._job}.json")
        if self._overwrite:
            # new-first, delete-after (ADVICE r8): everything of THIS
            # job carries its uuid; anything else is prior data
            for f in os.listdir(self._path):
                if self._job in f or f.endswith(".tmp"):
                    continue
                if f.endswith((".jsonl", ".json")) or f.startswith("_job-"):
                    _os.remove(_os.path.join(self._path, f))
        self._drop_job_litter()

    def abort(self, messages) -> None:
        self._drop_tmps(messages)
        self._drop_job_litter()


class JsonlStreamWriter(_JsonlWriterBase, DataSourceStreamWriter):
    """Streaming sink: `df.writeStream.format("graft_jsonl")`.

    Exactly-once publish per micro-batch, with the manifest
    (`_commit-<epoch>.json`, written temp-then-rename) as the atomic
    commit point end-to-end: a REPLAYED batch (failure after commit,
    before the checkpoint recorded it) finds the manifest, drops its
    temps, and publishes nothing, so replays cannot duplicate rows;
    a batch replayed after a crash MID-publish (some part files
    renamed, no manifest) first deletes those orphaned
    `part-<epoch>-*` files — only manifest-listed data survives, so
    the partial first attempt cannot double rows (ADVICE r8)."""

    def write(self, iterator):
        return self._write_tmp(iterator, "part")

    def commit(self, messages, batchId: int) -> None:
        import os as _os

        manifest = f"_commit-{batchId}.json"
        if _os.path.exists(_os.path.join(self._path, manifest)):
            self._drop_tmps(messages)  # replay of a committed batch
            return
        # no manifest => this epoch never committed; any part files
        # already carrying its stamp are orphans of a crashed publish
        # and would duplicate the rows this attempt is about to write
        prefix = f"part-{batchId}-"
        for f in _os.listdir(self._path):
            if f.startswith(prefix) and f.endswith((".jsonl", ".json")):
                _os.remove(_os.path.join(self._path, f))
        # stamp the epoch into the published names for debuggability
        for m in messages:
            if m is None:
                continue
            stamped = m.tmp_name.replace("part-", f"part-{batchId}-", 1)
            _os.rename(
                _os.path.join(self._path, m.tmp_name),
                _os.path.join(self._path, stamped),
            )
            m.tmp_name = stamped
        self._publish(messages, manifest)
        self._drop_job_litter()

    def abort(self, messages, batchId: int) -> None:
        self._drop_tmps(messages)
