"""Feature-store join semantics (SURVEY.md §2B joins, round-5
post-window tier).

The plain as-of join (plans/joins.py::join_asof) answers "what was the
latest value at time T"; a feature store additionally REFUSES values
older than a staleness budget — serving a week-old feature is usually
worse than serving none, and the tolerance is part of the join's
contract (pandas.merge_asof(tolerance=...), Flink's temporal join TTL).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.asof import asof_join
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ASOF_TOLERANCE_US = 48 * 3600 * 1_000_000  # 48h staleness budget


@register(
    "join_asof_tolerance",
    oracle=f"""
WITH m AS (
    SELECT e.event_id AS event_id, e.user_id AS user_id,
           e.ts AS e_ts, s.ts AS s_ts, s.event_id AS s_id
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
)
SELECT event_id, user_id,
       CASE WHEN s_ts IS NOT NULL
                 AND epoch_us(e_ts) - epoch_us(s_ts)
                     <= {ASOF_TOLERANCE_US}::BIGINT
            THEN s_id END AS signup_event_id,
       CASE WHEN s_ts IS NOT NULL
                 AND epoch_us(e_ts) - epoch_us(s_ts)
                     <= {ASOF_TOLERANCE_US}::BIGINT
            THEN (epoch_us(e_ts) - epoch_us(s_ts)) // 1000000
            END AS staleness_s
FROM m
""",
    tags=("join", "asof", "feature-store"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness budget: each error event gets the
    latest same-user signup at-or-before it ONLY if that match is at
    most 48h old — older matches are rejected to NULL exactly like
    missing ones (pandas.merge_asof's ``tolerance=``; the temporal-join
    TTL every feature store enforces at serving time). The surviving
    match also reports its staleness in whole seconds — exact integer
    microsecond arithmetic on both engines, truncation == floor for
    the non-negative backward-join deltas.

    Scale shape: identical to join_asof — the tolerance is a pure
    codegen post-filter on the single-shuffle union+window as-of
    (operators/asof.py carries the matched ts out as just another
    value column), so the staleness budget costs NOTHING over the
    plain as-of; no range join, no per-row re-scan."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    refs = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        "ts",
        F.col("ts").alias("matched_ts"),
    )
    joined = asof_join(
        probes,
        refs,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=("signup_id", "matched_ts"),
    )
    diff_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("matched_ts").cast("timestamp")
    )
    fresh = F.col("matched_ts").isNotNull() & (diff_us <= ASOF_TOLERANCE_US)
    return joined.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("signup_id")).alias("signup_event_id"),
        F.when(fresh, (diff_us / 1_000_000).cast("long")).alias("staleness_s"),
    )
