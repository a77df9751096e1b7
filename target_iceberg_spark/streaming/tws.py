"""transformWithState operators (Spark 4's arbitrary-state API,
SPARK-49564 / SPIP `transformWithStateInPandas`).

applyInPandasWithState (streaming/stateful.py) carries ONE flat tuple
of state per key; the Spark 4 API adds what that can't express: TYPED
composite state (ValueState / ListState / MapState), per-state TTL,
and timers — backed by the RocksDB state store. This module hosts the
engine's first operator on the new API:

  streaming_running_topk — a per-group running leaderboard: cumulative
  value per (group, member) kept in a MapState, top-k snapshot emitted
  per micro-batch. The MapState IS the point: with the old API the
  member->total map would be serialized/deserialized whole through
  one state tuple every batch; MapState updates touch only the
  members seen in the batch.

Requires (a) the RocksDB state store provider
(`spark.sql.streaming.stateStore.providerClass =
 ...state.RocksDBStateStoreProvider`) — transformWithState refuses
the default HDFS-backed store; tests set it per-session — and (b) the
`protobuf` Python package, which carries the new API's state-server
wire protocol (`pyspark/sql/streaming/proto/StateMessage_pb2`). This
container ships pyspark WITHOUT protobuf (verified: the driver worker
crashes with `ImportError: cannot import name 'descriptor' from
'google.protobuf'`), so the operator is environment-gated exactly
like the Iceberg jar e2e: `tws_available()` probes the dependency,
the test skips cleanly when absent, and the operator runs unchanged
the moment the package appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TOPK_K = 10


def tws_available() -> bool:
    """True iff the transformWithState Python wire protocol can load
    (pyspark's bundled proto needs the real `protobuf` package)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        from pyspark.sql.streaming.proto import (  # noqa: F401
            StateMessage_pb2,
        )
    except ImportError:
        return False
    return True


def streaming_running_topk(
    events: DataFrame,
    group_col: str = "event_type",
    member_col: str = "user_id",
    value_col: str = "value",
    k: int = TOPK_K,
) -> DataFrame:
    """Running top-{TOPK_K} members by cumulative value per group,
    maintained with Spark 4 ``transformWithStateInPandas``: per group
    a MapState(member -> running total) absorbs each micro-batch's
    per-member sums (one state touch per member SEEN, not per member
    EVER), a ValueState epoch counter tags snapshots, and each batch
    emits the current top-k (ties broken by member id).

    The snapshot cost is one MapState scan per touched group per
    batch — acceptable while |members per group| stays leaderboard-
    sized in context (here |users|); a planet-scale deployment bounds
    it with the capacity-capped heavy-hitters sketch twin
    (streaming_heavy_hitters) and uses this exact form downstream of
    that filter. Batch equivalence (same totals, same top-k set) is
    pinned in tests/test_streaming.py."""
    import pandas as pd  # executor-side; local import for pickling

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        f"{group_col} STRING, epoch LONG, rank LONG, "
        f"{member_col} LONG, total DOUBLE"
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getMapState(
                "totals", f"{member_col} LONG", "total DOUBLE"
            )
            self._epoch = handle.getValueState("epoch", "epoch LONG")

        def handleInputRows(self, key, rows, timerValues):
            batch = pd.concat(list(rows), ignore_index=True)
            per_member = batch.groupby(member_col)[value_col].sum()
            for member, add in per_member.items():
                mk = (int(member),)
                prev = self._totals.getValue(mk)
                base = float(prev[0]) if prev is not None else 0.0
                self._totals.updateValue(mk, (base + float(add),))
            epoch = (
                int(self._epoch.get()[0]) if self._epoch.exists() else 0
            ) + 1
            self._epoch.update((epoch,))
            board = sorted(
                ((float(v[0]), int(m[0])) for m, v in self._totals.iterator()),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            yield pd.DataFrame(
                {
                    group_col: [key[0]] * len(board),
                    "epoch": [epoch] * len(board),
                    "rank": list(range(1, len(board) + 1)),
                    member_col: [m for _, m in board],
                    "total": [t for t, _ in board],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select(group_col, member_col, value_col)
        .groupBy(group_col)
        .transformWithStateInPandas(
            TopKProcessor(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )
    )
