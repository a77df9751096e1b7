"""Skew-salted join plan (SURVEY.md §2B join family, scale tier).

The fact side of a fact-dim join concentrates on hot keys (power-law
users); operators/skew.py::salted_join spreads each key over `buckets`
reducers by replicating the dim. The oracle is the UNSALTED plain join
— salting is a pure physical rewrite, so the result must hash-match
exactly, which is itself the test that the rewrite is semantics-
preserving.

Fixture-scale cost note (round-13 audit of the r12 3.06x 10x-ratio
watch item): salting's overhead is CONSTANT per query — the dim
replicates 8x and the join shuffles (key, salt) instead of key — while
its benefit scales with the hot key's row count. At sf0.01 the hottest
user has ~40 events (salting is pure overhead, the measured 10x-ratio
inflation); the crossover is where one user's rows exceed a single
reducer's fair share (rows/shuffle-partitions) — at 100 TB a power-law
hot user owns millions of rows and the 8-way spread is the difference
between one straggler task and none. The sub-linear-looking ratio is
therefore the fixture paying the constant, not a scale defect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.rounding import portable_round
from target_iceberg_spark.operators.skew import salted_join
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "join_salted",
    oracle="""
WITH dim AS (
    SELECT user_id,
           COUNT(*) AS user_n_events,
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT))
                           AS DOUBLE) / (10000.0 * COUNT(*))
                      * 10000.0 + 0.5) AS DOUBLE) / 10000.0
               AS user_avg_value
    FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, d.user_n_events, d.user_avg_value
FROM events e JOIN dim d ON e.user_id = d.user_id
""",
    tags=("join", "skew"),
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich each event with its user's aggregate profile through a
    salted join: the per-user dim is replicated over 8 salt buckets and
    each fact row routes to one replica via a deterministic hash of its
    event_id — a hot user's rows land on 8 reducers instead of 1.

    The dim's avg runs over exact 1e-4-unit integers (FLOOR(x*1e4+0.5)
    then ONE double division of exact ints) and rounds via the
    portable FLOOR form (functions/rounding.py): at sf0.1 the plain
    AVG+ROUND flipped the 4th decimal on 56 of 100k users (sum-order
    ulp) and the exact average STILL flipped 64 (rationals landing
    exactly on the ROUND half-digit, where the engines' tie rules
    differ) — both found by the round-12 sf0.1 parity sweep."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_n_events"),
        portable_round(
            F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("bigint"))
            .cast("double")
            / (F.lit(10000.0) * F.count(F.lit(1))),
            4,
        ).alias("user_avg_value"),
    )
    return salted_join(
        ev.select("event_id", "user_id"), dim, "user_id", "event_id", buckets=8
    ).select("event_id", "user_id", "user_n_events", "user_avg_value")
