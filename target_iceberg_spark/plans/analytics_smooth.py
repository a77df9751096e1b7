"""Time-series smoothing and change detection over the event stream
(SURVEY.md §2B analytics tier, round-5 post-window).

events_ewma is the exponentially-weighted moving average every
monitoring / forecasting stack applies before thresholding; the
level-shift detector compares trailing vs leading rolling means to
flag step changes (deployment regressions, traffic migrations) that a
point-anomaly z-score (events_anomaly) misses by design.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

EWMA_ALPHA = 0.3
EWMA_WINDOW = 24  # hours of history per smoothed point
SHIFT_SIGMA = 1.5  # level-shift threshold in per-type std units


@register(
    "events_ewma",
    oracle=f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h, SUM(value) AS x
    FROM events GROUP BY 1
),
contrib AS (
    SELECT h + to_hours(CAST(g AS BIGINT)) AS h,
           POW({1 - EWMA_ALPHA}, g) AS w,
           POW({1 - EWMA_ALPHA}, g) * x AS wx,
           CASE WHEN g = 0 THEN x END AS x0
    FROM (SELECT h, x, unnest(range(0, {EWMA_WINDOW})) AS g FROM hourly)
)
SELECT c.h, ROUND(MAX(x0), 4) AS hourly_value,
       ROUND(SUM(wx) / SUM(w), 4) AS ewma
FROM contrib c JOIN (SELECT h FROM hourly) p USING (h)
GROUP BY c.h
ORDER BY c.h
""",
    tags=("timeseries", "smoothing", "events"),
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed hourly event volume (alpha={EWMA_ALPHA}, pandas
    ewm adjust=True semantics truncated to {EWMA_WINDOW} h of history):
    each observed hour's smoothed value is the weight-normalized sum of
    (1-alpha)^gap-weighted contributions from its trailing window.

    Scale shape: the textbook recursive EWMA is sequential and the
    closed-form window rewrite overflows ((1-a)^-t explodes past ~700
    steps), so this plan inverts the dependency: AFTER the hourly
    pre-aggregation (the only full-data stage, map-side combinable),
    each hour EXPLODES its bounded {EWMA_WINDOW}-row contribution list
    forward and one second combinable aggregation sums weights and
    weighted values per target hour — turning a non-equi band window
    into an equi-join-free pair of shuffles on a calendar-bounded
    table. Observed-hours semi filter drops phantom target hours past
    the series end; missing hours contribute nothing and renormalize
    automatically (exactly adjust=True handling of gaps)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum("value").alias("x")
    )
    contrib = hourly.select(
        "h", "x", F.explode(F.sequence(F.lit(0), F.lit(EWMA_WINDOW - 1))).alias("g")
    ).select(
        F.expr("h + make_interval(0, 0, 0, 0, g, 0, 0)").alias("h"),
        F.pow(F.lit(1 - EWMA_ALPHA), F.col("g")).alias("w"),
        (F.pow(F.lit(1 - EWMA_ALPHA), F.col("g")) * F.col("x")).alias("wx"),
        F.when(F.col("g") == 0, F.col("x")).alias("x0"),
    )
    observed = hourly.select("h")
    return (
        contrib.join(F.broadcast(observed), "h", "left_semi")
        .groupBy("h")
        .agg(
            F.round(F.max("x0"), 4).alias("hourly_value"),
            F.round(F.sum("wx") / F.sum("w"), 4).alias("ewma"),
        )
        .orderBy("h")
    )


@register(
    "events_level_shift",
    oracle=f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, AVG(value) AS x
    FROM events GROUP BY event_type, date_trunc('hour', ts)
),
framed AS (
    SELECT event_type, h,
           AVG(x) OVER (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS pre,
           AVG(x) OVER (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS post,
           lag(h, 7) OVER (PARTITION BY event_type ORDER BY h) AS h_pre7,
           lead(h, 6) OVER (PARTITION BY event_type ORDER BY h) AS h_post6,
           STDDEV_SAMP(x) OVER (PARTITION BY event_type) AS sd
    FROM hourly
)
SELECT event_type, h,
       ROUND(pre, 4) AS pre_mean,
       ROUND(post, 4) AS post_mean,
       ROUND(post - pre, 4) AS shift,
       (abs(post - pre) > {SHIFT_SIGMA} * sd) AS flagged
FROM framed
WHERE h_pre7 = h - to_hours(7) AND h_post6 = h + to_hours(6)
ORDER BY event_type, h
""",
    tags=("timeseries", "changepoint", "events"),
)
def events_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift (step-change) detection per event type: trailing
    7-hour mean vs leading 7-hour mean of the hourly value series;
    hours where the level jumps by more than {SHIFT_SIGMA} per-type
    standard deviations are flagged. Point-anomaly detection
    (events_anomaly) finds spikes; this finds sustained regime changes
    whose individual points all look normal.

    Scale shape: the only full-data stage is the hourly combinable
    pre-aggregation; every window after it runs over the
    calendar-bounded (event_type, hour) series — the bounded-window
    class this repo's CI sweep whitelists deliberately. Frames are
    guarded for CALENDAR CONTIGUITY (the 7-rows-back hour must be
    exactly 7 hours back, 6-rows-ahead exactly 6 ahead): a gappy
    series makes a 7-ROW frame span far more than 7 hours, and a mere
    row-count guard would compare lopsided time spans while claiming
    the frame is complete."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.avg("value").alias("x"))
    w = Window.partitionBy("event_type").orderBy("h")
    pre_f = w.rowsBetween(-7, -1)
    post_f = w.rowsBetween(0, 6)
    framed = hourly.select(
        "event_type",
        "h",
        F.avg("x").over(pre_f).alias("pre"),
        F.avg("x").over(post_f).alias("post"),
        F.lag("h", 7).over(w).alias("h_pre7"),
        F.lead("h", 6).over(w).alias("h_post6"),
        F.stddev_samp("x").over(Window.partitionBy("event_type")).alias("sd"),
    )
    hour = lambda n: F.expr(f"make_interval(0, 0, 0, 0, {n}, 0, 0)")  # noqa: E731
    return (
        framed.where(
            (F.col("h_pre7") == F.col("h") - hour(7))
            & (F.col("h_post6") == F.col("h") + hour(6))
        )
        .select(
            "event_type",
            "h",
            F.round("pre", 4).alias("pre_mean"),
            F.round("post", 4).alias("post_mean"),
            F.round(F.col("post") - F.col("pre"), 4).alias("shift"),
            (
                F.abs(F.col("post") - F.col("pre"))
                > SHIFT_SIGMA * F.col("sd")
            ).alias("flagged"),
        )
        .orderBy("event_type", "h")
    )


SEASONAL_LAG_H = 24  # seasonal-naive horizon: same hour yesterday


@register(
    "events_seasonal_error",
    oracle=f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, SUM(value) AS x
    FROM events GROUP BY event_type, date_trunc('hour', ts)
),
pred AS (
    SELECT c.event_type, c.x, p.x AS yhat
    FROM hourly c JOIN hourly p
      ON p.event_type = c.event_type
     AND p.h + to_hours({SEASONAL_LAG_H}) = c.h
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_evaluated,
       ROUND(AVG(abs(x - yhat)), 4) AS mae,
       ROUND(AVG(abs(x - yhat) / abs(x)), 4) AS mape
FROM pred
GROUP BY event_type
ORDER BY event_type
""",
    tags=("timeseries", "forecast", "events"),
)
def events_seasonal_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each hour's total
    event value by the SAME HOUR YESTERDAY (lag {SEASONAL_LAG_H} on
    the hourly series) and report MAE / MAPE per event type — the
    baseline error every forecasting effort must beat before any model
    earns its compute, computed directly inside the engine.

    Scale shape: identical discipline to events_ewma — one combinable
    hourly pre-aggregation is the only full-data stage; the alignment
    is an equi-join ON THE CALENDAR HOUR (cur.h = prev.h + 24h), not a
    row-offset lag — a gappy series row-shifts into the wrong
    counterpart silently, which is exactly how a forecast eval quietly
    lies. Hours with no yesterday-counterpart drop out of the inner
    join: excluded, not imputed (imputing would deflate MAPE)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum("value").alias("x"))
    prev = hourly.select(
        "event_type",
        F.expr(
            f"h + make_interval(0, 0, 0, 0, {SEASONAL_LAG_H}, 0, 0)"
        ).alias("h"),
        F.col("x").alias("yhat"),
    )
    pred = hourly.join(prev, ["event_type", "h"]).select(
        "event_type", "x", "yhat"
    )
    err = F.abs(F.col("x") - F.col("yhat"))
    return (
        pred.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_evaluated"),
            F.round(F.avg(err), 4).alias("mae"),
            F.round(F.avg(err / F.abs(F.col("x"))), 4).alias("mape"),
        )
        .orderBy("event_type")
    )


ACF_MAX_LAG = 24  # autocorrelation horizon (hours)


@register(
    "events_acf",
    oracle=f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h, SUM(value) AS x
    FROM events GROUP BY 1
),
lagged AS (
    SELECT g.lag, a.x AS x0, b.x AS x1
    FROM (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag) g
    JOIN hourly a ON TRUE
    JOIN hourly b ON b.h = a.h - to_hours(CAST(g.lag AS BIGINT))
)
SELECT CAST(lag AS INT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(corr(x0, x1), 4) AS acf
FROM lagged
GROUP BY lag
ORDER BY lag
""",
    tags=("timeseries", "autocorrelation", "events"),
)
def events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation profile of the hourly event-value series at lags
    1..{ACF_MAX_LAG} (Pearson correlation of the series with its
    lagged self) — the diagnostic that reveals seasonality period and
    smoothing-window choices (the spike at lag 24 is WHY
    events_seasonal_error uses a 24-hour horizon).

    Scale shape: the series pre-aggregates to calendar-bounded hourly
    rows (the only full-data stage, combinable); each lag's pairs come
    from an EQUI-join of the series against itself shifted by the
    exploded CALENDAR-HOUR offset — a row-index shift would silently
    pair across gaps in the series — the same bounded-fanout
    band-to-equi-join rewrite as events_ewma, never a non-equi
    nested loop — and corr() aggregates with partial merge."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum("value").alias("x")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = hourly.crossJoin(F.broadcast(lags)).select(
        "lag",
        F.col("x").alias("x0"),
        F.expr("h - make_interval(0, 0, 0, 0, lag, 0, 0)").alias("h_b"),
    )
    b = hourly.select(F.col("h").alias("h_b"), F.col("x").alias("x1"))
    return (
        a.join(b, "h_b")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("x0", "x1"), 4).alias("acf"),
        )
        .orderBy("lag")
    )


MEDIAN_WINDOW_H = 7  # trailing rolling-median width (hours)


@register(
    "win_rolling_median",
    oracle=f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                           AS DOUBLE) / (1000000.0 * COUNT(*))
                      * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS x
    FROM events GROUP BY event_type, date_trunc('hour', ts)
),
contrib AS (
    SELECT event_type, h + to_hours(CAST(g AS BIGINT)) AS h, x
    FROM (SELECT event_type, h, x,
                 unnest(range(0, {MEDIAN_WINDOW_H})) AS g
          FROM hourly)
)
SELECT event_type, h, n_win,
       CASE WHEN n_win % 2 = 1 THEN arr[(n_win + 1) // 2]
            ELSE (arr[n_win // 2] + arr[n_win // 2 + 1]) / 2.0
       END AS roll_median
FROM (
    SELECT c.event_type, c.h,
           CAST(COUNT(*) AS BIGINT) AS n_win,
           list_sort(list(c.x)) AS arr
    FROM contrib c
    JOIN (SELECT event_type, h FROM hourly) p
      ON c.event_type = p.event_type AND c.h = p.h
    GROUP BY c.event_type, c.h
)
ORDER BY event_type, h
""",
    tags=("window", "robust", "timeseries"),
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {MEDIAN_WINDOW_H}-hour ROLLING MEDIAN of the hourly
    value series per event type — the robust twin of the rolling mean
    (events_level_shift): one wild outlier hour shifts a mean for a
    full window width but leaves the median untouched.

    Spark cannot evaluate median/percentile over a custom window frame
    (AnalysisException — percentile-family window functions require
    the default frame), so the plan reuses the bounded forward-
    contribution explode from events_ewma: each hour feeds the
    {MEDIAN_WINDOW_H} target hours it belongs to, and a plain GROUPED
    median — which Spark does support, with partial aggregation —
    computes each window. Same shape in DuckDB so grouping semantics
    (calendar-hour windows, gaps excluded, ragged leading windows
    reported with their true n_win) are identical by construction."""
    ev = load_table(spark, sf_dir, "events")
    # the hourly series is an EXACT-integer average (1e-6-unit floors
    # summed as bigint, one double division) rounded via the portable
    # FLOOR form (functions/rounding.py): plain ROUND(AVG,6) flipped
    # 3 of 3600 sf0.1 rows — sum-order ulp plus the engines' differing
    # ROUND tie rules on exact-half rationals (sf0.1 parity sweep)
    from target_iceberg_spark.functions.rounding import portable_round

    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        portable_round(
            F.sum(F.floor(F.col("value") * 1000000 + 0.5).cast("bigint"))
            .cast("double")
            / (F.lit(1000000.0) * F.count(F.lit(1))),
            6,
        ).alias("x")
    )
    contrib = hourly.select(
        "event_type",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(MEDIAN_WINDOW_H - 1))).alias("g"),
        F.expr("h + make_interval(0, 0, 0, 0, g, 0, 0)").alias("h"),
    ).select("event_type", "h", "x")
    observed = hourly.select("event_type", "h")
    return (
        contrib.join(F.broadcast(observed), ["event_type", "h"], "left_semi")
        .groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).alias("n_win"),
            F.sort_array(F.collect_list("x")).alias("arr"),
        )
        # explicit median from the sorted window: Spark's median()
        # interpolates even counts as a+(b-a)*0.5 while DuckDB uses
        # (a+b)/2 — mathematically equal, ulp-DIFFERENT; spelling out
        # one formula on both engines makes the hash exact
        .select(
            "event_type",
            "h",
            "n_win",
            # raw, UNROUNDED: both engines compute (a+b)/2 over the
            # same 6-decimal inputs, so the double is bit-identical —
            # while ROUND(x, 4) at the interpolation's exact .5
            # boundary diverges (Spark rounds the shortest-repr
            # decimal, DuckDB the binary value)
            F.when(
                F.col("n_win") % 2 == 1,
                F.element_at("arr", ((F.col("n_win") + 1) / 2).cast("int")),
            )
            .otherwise(
                (
                    F.element_at("arr", (F.col("n_win") / 2).cast("int"))
                    + F.element_at("arr", (F.col("n_win") / 2 + 1).cast("int"))
                )
                / 2.0
            )
            .alias("roll_median"),
        )
        .orderBy("event_type", "h")
    )


WAU_DAYS = 7  # trailing window for weekly-active


@register(
    "events_dau_wau",
    oracle=f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
contrib AS (
    SELECT user_id, day + CAST(g AS INTEGER) AS day
    FROM (SELECT user_id, day, unnest(range(0, {WAU_DAYS})) AS g FROM ud)
),
wau AS (
    SELECT c.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
    FROM contrib c JOIN (SELECT DISTINCT day FROM ud) p USING (day)
    GROUP BY c.day
),
dau AS (
    SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
)
SELECT day, dau, wau,
       ROUND(CAST(dau AS DOUBLE) / wau, 4) AS stickiness
FROM dau JOIN wau USING (day)
ORDER BY day
""",
    tags=("events", "engagement", "analytics"),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily / trailing-{WAU_DAYS}-day active users and the DAU/WAU
    stickiness ratio — the product-engagement headline metric.

    Scale shape: the full-data stage is ONE distinct over (user, day)
    — map-side combinable, and the natural place for
    approx_count_distinct/HLL at 100 TB (agg_hll_rollup is exactly
    that sketch path; exact form kept here for the hash oracle). The
    trailing-window distinct then runs over the (user, day) PAIRS, not
    events: each pair contributes itself forward to the {WAU_DAYS}
    calendar days it keeps the user 'weekly active' for (the
    events_ewma contribution explode), and one distinct count per
    target day finishes. Observed-days semi filter drops phantom
    trailing days beyond the series end."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(WAU_DAYS - 1))).alias("g"),
        F.col("day"),
    ).select("user_id", F.expr("date_add(day, g)").alias("day"))
    observed = ud.select("day").distinct()
    wau = (
        contrib.join(F.broadcast(observed), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )
