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
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
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
        files = sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith((".json", ".jsonl"))
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

    Offsets are ``{"file_idx": n}`` (files consumed so far), which
    makes the source REPLAYABLE: ``readBetweenOffsets(start, end)``
    re-parses exactly files [start, end), so a failed micro-batch
    re-executes with identical rows — the exactly-once contract a
    checkpointed Structured Streaming query requires from its source.

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

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith((".json", ".jsonl"))
        )

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
        return {"file_idx": 0}

    def read(self, start: dict):
        files = self._files()
        i = start["file_idx"]
        j = min(i + self._per_batch, len(files))
        return iter(self._parse(files[i:j])), {"file_idx": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        return iter(self._parse(files[start["file_idx"] : end["file_idx"]]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — files are the durable log
