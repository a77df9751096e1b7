"""Seasonal-naive forecast backtest (SURVEY.md §2B time-series tier,
round 10).

The time-series tier measures the past (EWMA, ACF, seasonal strength,
changepoint); nothing yet FORECASTS. The honest distributed baseline
is seasonal-naive — y_hat(t) = y(t - season) — which the forecasting
literature mandates as the floor every model must beat (Hyndman &
Athanasopoulos, "Forecasting: Principles and Practice", public; MASE
scales by exactly this method's in-sample error). A backtest of
snaive needs no model state at all: one lag join on the daily series,
holdout on the final week, MAE/MAPE per event type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SNAIVE_SEASON = 7  # weekly seasonality on the daily grid
SNAIVE_HOLDOUT = 7  # backtest horizon: final week


@register(
    "events_snaive_backtest",
    oracle=f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           ROUND(SUM(value), 6) AS y
    FROM events GROUP BY 1, 2
),
lagged AS (
    SELECT event_type, day, y,
           LAG(y, {SNAIVE_SEASON}) OVER (PARTITION BY event_type
                                         ORDER BY day) AS y_hat,
           MAX(day) OVER (PARTITION BY event_type) AS last_day
    FROM daily
),
holdout AS (
    SELECT event_type, y, y_hat
    FROM lagged
    WHERE y_hat IS NOT NULL
      AND day > last_day - INTERVAL {SNAIVE_HOLDOUT} DAY
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(ABS(y - y_hat)), 6) AS mae,
       ROUND(AVG(ABS(y - y_hat) / ABS(y)), 6) AS mape
FROM holdout
GROUP BY event_type
ORDER BY event_type
""",
    tags=("timeseries", "forecast", "backtest"),
)
def events_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest the seasonal-naive forecaster (y_hat(t) =
    y(t-{SNAIVE_SEASON})) on the final {SNAIVE_HOLDOUT} days of each
    event type's daily value series: per-type MAE and MAPE — the
    baseline error floor any real forecasting model must beat, and
    the denominator MASE normalizes by.

    Scale shape: ONE combinable daily groupBy (calendar x types
    bounded), then a single lag window PARTITIONED by event type
    (each series sorts independently — the well-partitioned window
    class), a holdout filter, and a bounded final aggregate. No
    model state, no iteration; daily sums round to 6 before
    differencing so both engines subtract identical values."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "y",
        F.lag("y", SNAIVE_SEASON).over(w).alias("y_hat"),
        F.max("day").over(Window.partitionBy("event_type")).alias("last_day"),
    )
    holdout = lagged.where(
        F.col("y_hat").isNotNull()
        & (F.col("day") > F.date_sub(F.col("last_day"), SNAIVE_HOLDOUT))
    )
    return (
        holdout.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.avg(F.abs(F.col("y") - F.col("y_hat"))), 6).alias("mae"),
            F.round(
                F.avg(F.abs(F.col("y") - F.col("y_hat")) / F.abs(F.col("y"))), 6
            ).alias("mape"),
        )
        .orderBy("event_type")
    )
