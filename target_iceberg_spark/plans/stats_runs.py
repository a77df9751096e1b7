"""Wald–Wolfowitz runs test (SURVEY.md §2B stats tier, round 8).

The classic nonparametric randomness screen (Wald & Wolfowitz 1940,
public): in a binary sequence with n+ positives and n- negatives, the
number of RUNS (maximal same-symbol blocks) has known mean
mu = 2·n+·n-/n + 1 and variance (mu-1)(mu-2)/(n-1) under the
exchangeability null; too FEW runs means clumping (sessions, bursts,
state), too MANY means alternation (load balancing artifacts,
interleaved writers). Applied per user to the above/below-median
value sequence it is the bot detector's statistical cousin:
events_bot_score thresholds heuristics, this one carries an actual
sampling distribution.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

RUNS_MIN_EVENTS = 30
RUNS_TOP = 20


@register(
    "agg_runs_test",
    oracle=f"""
WITH med AS (
    SELECT quantile_cont(value, 0.5) AS m FROM events
),
seq AS (
    SELECT user_id,
           CASE WHEN value > (SELECT m FROM med) THEN 1 ELSE 0 END AS s,
           ts, event_id
    FROM events
),
flagged AS (
    SELECT user_id, s,
           CASE WHEN lag(s) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR lag(s) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) <> s
                THEN 1 ELSE 0 END AS new_run
    FROM seq
),
stats AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(s) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_neg,
           CAST(SUM(new_run) AS BIGINT) AS n_runs
    FROM flagged GROUP BY user_id
),
scored AS (
    SELECT user_id, n, n_pos, n_neg, n_runs,
           2.0 * n_pos * n_neg / n + 1 AS mu
    FROM stats
    WHERE n >= {RUNS_MIN_EVENTS} AND n_pos > 0 AND n_neg > 0
)
SELECT user_id, n, n_runs,
       ROUND(mu, 4) AS expected_runs,
       ROUND((n_runs - mu)
             / sqrt((mu - 1) * (mu - 2) / (n - 1)), 4) AS z
FROM scored
WHERE (mu - 1) * (mu - 2) > 0
ORDER BY ROUND((n_runs - mu)
             / sqrt((mu - 1) * (mu - 2) / (n - 1)), 4), user_id
LIMIT {RUNS_TOP}
""",
    tags=("stats", "nonparametric", "runs-test"),
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Wald–Wolfowitz runs test on the above/below-median
    value sequence: count maximal same-symbol runs with one lag
    window (partitioned by user), score z = (R - mu)/sigma from the
    closed-form null moments, and report the {RUNS_TOP} most
    CLUMPED users (lowest z — too few runs: sticky state, sessions,
    or a bot replaying a fixed script). The global median is one
    combinable percentile broadcast; everything else is a per-user
    window plus combinable counts.

    Scale shape: no global window — the lag partitions by user; the
    moment arithmetic runs on the per-user stats table; finisher is
    TakeOrderedAndProject on the rounded z."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.agg(F.expr("percentile(value, 0.5)").alias("m"))
    seq = ev.crossJoin(F.broadcast(med)).select(
        "user_id",
        F.when(F.col("value") > F.col("m"), 1).otherwise(0).alias("s"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = seq.select(
        "user_id",
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    stats = flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n_neg"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
    )
    mu = 2.0 * F.col("n_pos") * F.col("n_neg") / F.col("n") + 1
    var = (mu - 1) * (mu - 2) / (F.col("n") - 1)
    z = F.round((F.col("n_runs") - mu) / F.sqrt(var), 4)
    return (
        stats.where(
            (F.col("n") >= RUNS_MIN_EVENTS)
            & (F.col("n_pos") > 0)
            & (F.col("n_neg") > 0)
        )
        .where((mu - 1) * (mu - 2) > 0)
        .select(
            "user_id",
            "n",
            "n_runs",
            F.round(mu, 4).alias("expected_runs"),
            z.alias("z"),
        )
        .orderBy("z", "user_id")
        .limit(RUNS_TOP)
    )
