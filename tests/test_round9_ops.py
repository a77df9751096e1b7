"""Round-9 operator tests: the events_sequence_dataset serialization
fix, the sim_ivf_recall_curve audit-row reduction, the Markov
state-universe/zero-row hardening (ADVICE r8), and the round-9 query
additions."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from target_iceberg_spark.plans.registry import all_specs
from tests.oracle_harness import compare_frames

SPECS = all_specs()


# ---------------------------------------------------------------------------
# events_sequence_dataset: driver-hashable serialization (VERDICT r8 #1)
# ---------------------------------------------------------------------------


def test_sequence_dataset_context_cells_exact(spark, sf_oracle):
    """The cell-exact ARRAY assertion the registered query no longer
    carries (it serializes for the driver's canonicalizer): every
    context array must hold exactly the CTX_LEN event types preceding
    the label in (ts, event_id) stream order."""
    from target_iceberg_spark.plans.dataset_builder import (
        CTX_LEN,
        _sequence_rows,
    )
    from target_iceberg_spark.sources.tables import load_table

    rows = _sequence_rows(spark, sf_oracle).collect()
    assert rows
    users = {r["user_id"] for r in rows}
    ev = (
        load_table(spark, sf_oracle, "events")
        .where(F.col("user_id").isin(list(users)))
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams: dict[int, list] = {}
    for e in sorted(ev, key=lambda e: (e["ts"], e["event_id"])):
        streams.setdefault(e["user_id"], []).append(e)
    pos = {
        (e["user_id"], e["event_id"]): i
        for s in streams.values()
        for i, e in enumerate(s)
    }
    for r in rows:
        i = pos[(r["user_id"], r["event_id"])]
        assert i >= CTX_LEN  # gate: context is full
        expect = [
            e["event_type"] for e in streams[r["user_id"]][i - CTX_LEN : i]
        ]
        assert list(r["context"]) == expect
        assert r["label"] == streams[r["user_id"]][i]["event_type"]


def test_sequence_dataset_serializes_the_same_rows(spark, sf_oracle):
    """The registered query must be exactly _sequence_rows with the
    context array '>'-joined — no other transformation."""
    ser = SPECS["events_sequence_dataset"].builder(spark, sf_oracle).collect()
    from target_iceberg_spark.plans.dataset_builder import _sequence_rows

    arr = {
        (r["user_id"], r["event_id"]): (list(r["context"]), r["label"])
        for r in _sequence_rows(spark, sf_oracle).collect()
    }
    assert len(ser) == len(arr)
    for r in ser:
        ctx, label = arr[(r["user_id"], r["event_id"])]
        assert r["context"] == ">".join(ctx)
        assert r["label"] == label
        assert isinstance(r["context"], str)  # hashable by the driver


# ---------------------------------------------------------------------------
# events_markov_stationary: ADVICE r8 hardening
# ---------------------------------------------------------------------------

_MARKOV_EDGE_ROWS = [
    # user 1: a -> b -> dead_end (dead_end has NO outgoing bigram
    # anywhere: it is every emitting user's final event)
    (1, "2024-01-01 00:00:00", 1, "a"),
    (2, "2024-01-01 00:01:00", 1, "b"),
    (3, "2024-01-01 00:02:00", 1, "dead_end"),
    # user 2: b -> a -> dead_end
    (4, "2024-01-01 00:00:00", 2, "b"),
    (5, "2024-01-01 00:01:00", 2, "a"),
    (6, "2024-01-01 00:02:00", 2, "dead_end"),
    # user 3: the SOLE-event user — 'lonely' appears in no bigram at
    # all, so it must still be a state (oracle's SELECT DISTINCT)
    (7, "2024-01-01 00:00:00", 3, "lonely"),
]


def _write_edge_events(spark, tmp_path) -> str:
    df = spark.createDataFrame(
        [
            (eid, ts, uid, et, 1.0, "{}")
            for eid, ts, uid, et in _MARKOV_EDGE_ROWS
        ],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(out)
    return str(tmp_path)


def test_markov_survives_terminal_and_sole_states(spark, tmp_path):
    """ADVICE r8 (analytics_markov.py): a state with no outgoing
    bigram must not divide by zero / NaN-poison the chain, and a type
    occurring only as a user's sole event must still be a state. The
    Spark arm must keep matching the recursive-CTE oracle on exactly
    this corpus."""
    spec = SPECS["events_markov_stationary"]
    sf = _write_edge_events(spark, tmp_path)
    spark_pdf = spec.builder(spark, sf).toPandas()

    assert sorted(spark_pdf["event_type"]) == ["a", "b", "dead_end", "lonely"]
    assert not spark_pdf["stationary_prob"].isna().any()
    # dead_end absorbs mass OUT of the chain each round (inner-join
    # semantics in the oracle); after 50 rounds everything has leaked
    assert (spark_pdf["stationary_prob"] >= 0).all()
    assert spark_pdf["stationary_prob"].sum() <= 1.0 + 1e-9

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet/*.parquet')"
        )
        duck_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    compare_frames("events_markov_stationary[edge]", spark_pdf, duck_pdf)
