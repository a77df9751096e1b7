"""Custom stateful streaming operators (applyInPandasWithState).

The built-in streaming surface (window / session_window / watermark,
streaming/pipeline.py) covers the reference's lifecycle; this module
adds the custom-state tier Spark exposes for operators the built-ins
cannot express: arbitrary per-key state with explicit timeout control.

The flagship here is streaming FIRST-SEEN DEDUPLICATION — the
streaming face of the dedup north star: emit a record the first time
its key appears, suppress every later duplicate, and expire key state
after a configurable quiet period so state size tracks the active-key
working set instead of the full history. (Spark's built-in
``dropDuplicates`` on a stream keeps state forever unless bounded by
an event-time watermark column; the explicit processing-time timeout
here is the knob an ingestion pipeline actually wants.)

Batch twin: plans/streaming_batch.py::stream_dedup_first (row_number
ascending over the same ordering) — oracle-checked; streaming/batch
equivalence is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def first_seen_dedup(
    events: DataFrame,
    key_col: str = "event_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    state_timeout_ms: int | None = 600_000,
) -> DataFrame:
    """First-seen dedup over a stream: one output row per distinct key.

    Per-key state is a single "seen" marker. Within a micro-batch the
    deterministic winner is the minimum of ``order_cols``; across
    batches the first-arriving batch wins (at-least-once upstream =>
    first-seen-wins is the standard idempotency rule). State expires
    ``state_timeout_ms`` after the key's last sighting — a late
    duplicate arriving after expiry re-emits, which is the documented
    trade of bounded state for unbounded streams.

    ``state_timeout_ms=None`` disables expiry (state grows with the
    distinct-key count). Required for bounded ``availableNow`` drains:
    with pending processing-time timeouts MicroBatchExecution keeps
    scheduling catch-up batches until every timeout fires, so a
    drain-and-stop run with a long timeout never terminates.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = events.schema
    order = list(order_cols)
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if state_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )

    def dedup_fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        best = None  # running (order_cols)-minimal row across chunks
        for pdf in pdfs:
            if state.exists or len(pdf) == 0:
                continue
            cand = pdf.sort_values(order, kind="mergesort").iloc[:1]
            if best is None:
                best = cand
            else:
                import pandas as pd

                best = (
                    pd.concat([best, cand])
                    .sort_values(order, kind="mergesort")
                    .iloc[:1]
                )
        if best is not None:
            yield best
        if not state.exists:
            state.update((True,))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)

    return events.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="seen BOOLEAN",
        outputMode="append",
        timeoutConf=timeout_conf,
    )
