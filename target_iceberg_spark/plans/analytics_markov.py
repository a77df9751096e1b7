"""Markov-chain user-behavior model (SURVEY.md §2B events tier,
round 8).

The first-order event-type Markov chain: estimate the transition
matrix from observed per-user bigrams, then solve for the STATIONARY
DISTRIBUTION — where user behavior settles if the observed dynamics
keep running. Product analytics uses it as the model-based complement
of the empirical type mix (a gap between the two flags non-stationary
behavior: onboarding funnels, decaying engagement); events_transitions
already ships the raw matrix, this closes the loop with the fixed
point.

Cross-engine shape is the interesting part: the ORACLE solves the
fixed point with a recursive CTE (DuckDB allows aggregation over the
recursive reference: 50 rounds of pi <- pi . P as join + SUM). Spark's
WITH RECURSIVE forbids aggregates over the recursive branch
(INVALID_RECURSIVE_REFERENCE — probed, not assumed), so the Spark
plan computes the transition counts DISTRIBUTED, collects the k x k
matrix (a bounded codebook pull: k = |event types|, dozens of rows at
any corpus size), and runs the same 50 power-iteration rounds in
numpy on the driver — the emb_pca discipline (driver solve on a
bounded aggregate), here still oracle-checkable because both engines
converge to the same fixed point well inside the 6-dp rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

MARKOV_ITERS = 50


@register(
    "events_markov_stationary",
    oracle=f"""
WITH RECURSIVE pairs AS (
    SELECT user_id, event_type AS b,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS a
    FROM events
),
c AS (
    SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS c
    FROM pairs WHERE a IS NOT NULL GROUP BY a, b
),
p AS (
    SELECT a, b, c / SUM(c) OVER (PARTITION BY a) AS p FROM c
),
states AS (SELECT DISTINCT event_type AS s FROM events),
k AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM states),
it AS (
    SELECT 0 AS i, s, 1.0 / k.k AS v FROM states, k
    UNION ALL
    SELECT i + 1, p.b AS s, SUM(v * p.p) AS v
    FROM it JOIN p ON it.s = p.a
    WHERE i < {MARKOV_ITERS}
    GROUP BY i, p.b
),
emp AS (
    SELECT event_type AS s,
           CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
    FROM events GROUP BY event_type
)
SELECT states.s AS event_type,
       ROUND(COALESCE(fin.v, 0), 6) AS stationary_prob,
       ROUND(emp.share, 6) AS empirical_share
FROM states
LEFT JOIN (SELECT s, v FROM it WHERE i = {MARKOV_ITERS}) fin
       ON states.s = fin.s
JOIN emp ON states.s = emp.s
ORDER BY event_type
""",
    tags=("events", "markov", "recursive"),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain next to
    the empirical type mix. Transition bigrams come from the per-user
    lag window (partitioned — never global); the row-normalized
    k x k matrix is collected (bounded: k event types — the
    constant-size codebook-pull class) and {MARKOV_ITERS} rounds of
    pi <- pi . P run in numpy on the driver, mirroring the oracle's
    recursive-CTE iteration (Spark's WITH RECURSIVE rejects
    aggregates over the recursive branch, so the fixed point cannot
    be expressed in-plan; the distributed work — the only part that
    scales with data — is the bigram count).

    Scale shape: one partitioned window + one combinable groupBy over
    the events; everything after operates on k rows. The empirical
    share is a second combinable aggregate joined at k rows.

    Round-9 hardening (ADVICE r8): the state universe is the FULL
    distinct event_type set (a type occurring only as some user's
    sole event has no bigram but is still a state — the oracle's
    SELECT DISTINCT), and all-zero transition rows (no outgoing
    bigram) stay zero instead of dividing by zero: their mass simply
    leaves the chain each round, exactly what the oracle's inner join
    does to a state with no p.a row."""
    import numpy as np

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("a"),
        F.col("event_type").alias("b"),
    ).where(F.col("a").isNotNull())
    counts = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    rows = bounded_collect(
        counts, cap=10_000, why="k x k transition counts, k = |event types|"
    )
    states = sorted(
        r["event_type"]
        for r in bounded_collect(
            ev.select("event_type").distinct(),
            cap=1_000,
            why="distinct event types (k)",
        )
    )
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    P = np.zeros((k, k))
    for r in rows:
        P[idx[r["a"]], idx[r["b"]]] = r["c"]
    sums = P.sum(axis=1, keepdims=True)
    np.divide(P, sums, out=P, where=sums > 0)  # zero rows stay zero
    pi = np.full(k, 1.0 / k)
    for _ in range(MARKOV_ITERS):
        pi = pi @ P
    stat = spark.createDataFrame(
        [(s, float(pi[idx[s]])) for s in states],
        "event_type STRING, _pi DOUBLE",
    )
    emp = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    tot = emp.agg(F.sum("_n").alias("_t"))
    return (
        emp.crossJoin(F.broadcast(tot))
        .join(F.broadcast(stat), "event_type")
        .select(
            "event_type",
            F.round("_pi", 6).alias("stationary_prob"),
            F.round(F.col("_n") / F.col("_t"), 6).alias("empirical_share"),
        )
        .orderBy("event_type")
    )
