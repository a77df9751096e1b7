"""Holt linear-trend exponential smoothing (SURVEY.md §2B time-series
tier, round 11, post-window).

The forecasting tier has single smoothing (events_ewma) and the
seasonal-naive error floor (events_snaive_backtest); the classic next
step is Holt's double smoothing (Holt 1957; Winters 1960 — public):

    level_t = a * x_t + (1 - a) * (level_{t-1} + trend_{t-1})
    trend_t = g * (level_t - level_{t-1}) + (1 - g) * trend_{t-1}

The recurrence is inherently sequential, but the SERIES is
calendar-bounded (30 daily rows per event type at any corpus size),
so this follows the events_markov_stationary / emb_pca discipline:
the daily aggregate computes DISTRIBUTED (the only corpus-sized
stage), the bounded 30 x |types| series is pulled to the driver, and
the recurrence runs in plain Python with per-step rounding to 6.
Spark's native WITH RECURSIVE was measured first and rejected for the
hot path: each recursion step launches a full job, and 30 steps cost
~23 s where the bounded driver solve costs milliseconds — recursion
depth ~log(n) (sql_recursive_hierarchy) is the shape native recursive
CTEs pay off for, depth = series length is not.

The ORACLE still runs the recurrence as a declarative WITH RECURSIVE
fixpoint over the identical daily CTE, so the driver hash checks the
whole smoothing algebra end-to-end, not just the aggregate.

Output: per event type, the one-step-ahead MAE of Holt vs the naive
last-value forecast over the post-burn-in days, plus the final state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

HOLT_ALPHA = 0.3  # level smoothing
HOLT_GAMMA = 0.1  # trend smoothing
HOLT_BURN = 5  # one-step errors before this day index are excluded


@register(
    "events_holt_trend",
    oracle=f"""
WITH RECURSIVE raw AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           ROUND(AVG(value), 6) AS x
    FROM events GROUP BY 1, 2
),
daily AS (
    SELECT event_type, x,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS d
    FROM raw
),
holt(event_type, d, l, b, e_holt, e_naive) AS (
    SELECT d1.event_type, 2,
           ROUND({HOLT_ALPHA!r} * d2.x
                 + (1 - {HOLT_ALPHA!r}) * (d1.x + (d2.x - d1.x)), 6),
           ROUND((d2.x - d1.x), 6),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM daily d1 JOIN daily d2
      ON d2.event_type = d1.event_type AND d2.d = 2
    WHERE d1.d = 1
    UNION ALL
    SELECT s.event_type, s.d + 1,
           ROUND({HOLT_ALPHA!r} * nx.x
                 + (1 - {HOLT_ALPHA!r}) * (s.l + s.b), 6),
           ROUND({HOLT_GAMMA!r}
                     * (ROUND({HOLT_ALPHA!r} * nx.x
                              + (1 - {HOLT_ALPHA!r}) * (s.l + s.b), 6)
                        - s.l)
                 + (1 - {HOLT_GAMMA!r}) * s.b, 6),
           ROUND(ABS(nx.x - (s.l + s.b)), 6),
           ROUND(ABS(nx.x - px.x), 6)
    FROM holt s
    JOIN daily nx ON nx.event_type = s.event_type AND nx.d = s.d + 1
    JOIN daily px ON px.event_type = s.event_type AND px.d = s.d
)
SELECT event_type,
       CAST(COUNT(e_holt) FILTER (WHERE d > {HOLT_BURN}) AS BIGINT)
           AS n_scored,
       ROUND(AVG(e_holt) FILTER (WHERE d > {HOLT_BURN}), 4) AS mae_holt,
       ROUND(AVG(e_naive) FILTER (WHERE d > {HOLT_BURN}), 4) AS mae_naive,
       ROUND(arg_max(l, d), 4) AS final_level,
       ROUND(arg_max(b, d), 4) AS final_trend
FROM holt
GROUP BY event_type
ORDER BY event_type
""",
    tags=("events", "time-series", "forecast", "recursive"),
)
def events_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (alpha {HOLT_ALPHA}, gamma
    {HOLT_GAMMA}) over each event type's daily mean value: one-step
    MAE vs the naive last-value forecast after a {HOLT_BURN}-day
    burn-in, plus the final level/trend state.

    Scale shape: the daily aggregate is the only corpus-sized stage;
    the 30 x |types| series is a bounded driver pull (the markov /
    emb_pca discipline) and the recurrence runs in Python with the
    same per-step rounding the recursive-CTE oracle applies — the
    driver hash checks the smoothing algebra end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .select(
            "event_type",
            "x",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("day"))
            .cast("bigint")
            .alias("d"),
        )
    )
    series: dict[str, list[float]] = {}
    for row in bounded_collect(
        daily.orderBy("event_type", "d"),
        cap=10_000,
        why="calendar-bounded daily aggregate: <= ~31 days x |event types|",
    ):
        series.setdefault(row["event_type"], []).append(row["x"])
    out = []
    for et in sorted(series):
        xs = series[et]
        if len(xs) < 2:
            # The oracle's recursive base case needs days 1 and 2, so
            # single-day types are absent from its output too.
            continue
        level = round(
            HOLT_ALPHA * xs[1] + (1 - HOLT_ALPHA) * (xs[0] + (xs[1] - xs[0])),
            6,
        )
        trend = round(xs[1] - xs[0], 6)
        errs: list[float] = []
        naive: list[float] = []
        for i in range(2, len(xs)):  # state advances to day index i+1
            nx, px = xs[i], xs[i - 1]
            e = round(abs(nx - (level + trend)), 6)
            new_level = round(
                HOLT_ALPHA * nx + (1 - HOLT_ALPHA) * (level + trend), 6
            )
            trend = round(
                HOLT_GAMMA * (new_level - level) + (1 - HOLT_GAMMA) * trend, 6
            )
            level = new_level
            if i + 1 > HOLT_BURN:
                errs.append(e)
                naive.append(round(abs(nx - px), 6))
        out.append(
            (
                et,
                len(errs),
                # AVG over zero post-burn-in rows is NULL in the oracle.
                round(sum(errs) / len(errs), 4) if errs else None,
                round(sum(naive) / len(naive), 4) if naive else None,
                round(level, 4),
                round(trend, 4),
            )
        )
    return spark.createDataFrame(
        out,
        "event_type string, n_scored bigint, mae_holt double, "
        "mae_naive double, final_level double, final_trend double",
    ).orderBy("event_type")
