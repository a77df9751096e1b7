"""Sequence training-dataset materialization (SURVEY.md §2B curation
tier, round 7, post-window).

The last mile of an event-model pipeline: turn each user's event
stream into supervised (context, label) rows — the next-event-
prediction dataset every sequential recommender / behavior LM trains
on. curation_pack_sequences packs token budgets; this builds the
windows: per event, the previous CTX_LEN event types as an ARRAY
column (frame-ordered), the current type as the label, emitted only
when the context is full so every row has a fixed-width input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

CTX_LEN = 5  # events of context per training row
DS_ROWS = 500  # deterministic sample emitted (dataset head)


def _sequence_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset with `context` as a raw array<string> — the form a
    trainer consumes. Kept separate so tests can assert the array
    cells exactly; the registered query serializes the array to a
    canonical '>'-joined string because the external checker's
    canonicalizer cannot hash list cells (round-8 finding)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("label"),
            F.collect_list("event_type")
            .over(w.rowsBetween(-CTX_LEN, -1))
            .alias("context"),
            F.row_number().over(w).alias("_pos"),
        )
        .where(F.col("_pos") > CTX_LEN)
        .select("user_id", "event_id", "context", "label")
        .orderBy("user_id", "event_id")
        .limit(DS_ROWS)
    )


@register(
    "events_sequence_dataset",
    oracle=f"""
WITH seq AS (
    SELECT user_id, event_id, event_type,
           list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {CTX_LEN} PRECEDING AND 1 PRECEDING
           ) AS ctx,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS pos
    FROM events
)
SELECT user_id, event_id,
       array_to_string(ctx, '>') AS context,
       event_type AS label
FROM seq
WHERE pos > {CTX_LEN}
ORDER BY user_id, event_id
LIMIT {DS_ROWS}
""",
    tags=("curation", "dataset", "sequence"),
)
def events_sequence_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event-prediction rows: for every event past its user's
    {CTX_LEN}th, the previous {CTX_LEN} event types in stream order as
    the context (serialized '>'-joined, frame-ordered) and the current
    type as the label — the materialized supervised dataset a
    sequential recommender trains on. Context arrays are FRAME-ORDERED
    in both engines (Spark's collect_list over a window and DuckDB's
    list() both append in the frame's ORDER BY); the array is joined
    to one canonical string in BOTH arms so the checker's
    canonicalizer (which cannot factorize list cells) hash-compares
    it. tests/test_round9_ops.py keeps the cell-exact array assertion
    on the unserialized form (_sequence_rows).

    Scale shape: ONE partitionBy(user_id) window shuffle produces
    both the context array and the position gate (shared sort); at
    100 TB the LIMIT head becomes a per-user or per-shard write — the
    window pass is the data-path cost, and it is the same single
    shuffle every sessionize/lead query in the tier pays."""
    return _sequence_rows(spark, sf_dir).withColumn(
        "context", F.array_join("context", ">")
    )
