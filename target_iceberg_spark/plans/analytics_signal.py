"""Sequence-signal analytics (SURVEY.md §2B event-time family,
round 7): Markov entropy rate and rolling z-score anomalies.

Extends the engine's time-series tier (events_acf, events_cusum,
events_level_shift, win_rolling_median) with two classics the
reference (ingestion-only) never had:

  * events_entropy_rate — first-order Markov entropy of the
    per-user event-type process (Shannon 1948; Cover & Thomas ch.4):
    how predictable is the next action given the current one?
  * events_rolling_zscore — trailing-window z-score anomaly
    detection: score each event against its user's own recent
    history (the window EXCLUDES the current row, the standard
    leave-current-out control-chart form).

Both keep the one-shuffle-per-user-history discipline: lead()/rolling
frames partition by user_id, everything after the per-user pass is
bounded by the type alphabet or the reported top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ZSCORE_WINDOW = 20  # trailing events per user
ZSCORE_MIN_N = 10  # minimum trailing count before scoring
ZSCORE_TOPK = 50


@register(
    "events_entropy_rate",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
),
trans AS (
    SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS o
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY prev_type, next_type
),
probs AS (
    SELECT prev_type, o,
           o / CAST(SUM(o) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM trans
),
rows_h AS (
    SELECT prev_type,
           CAST(SUM(o) AS BIGINT) AS n_trans,
           -SUM(p * log2(p)) AS h_bits
    FROM probs
    GROUP BY prev_type
)
SELECT prev_type, n_trans,
       ROUND(h_bits, 4) AS h_bits,
       ROUND(h_bits * n_trans / CAST(SUM(n_trans) OVER () AS DOUBLE), 4)
           AS contrib_bits
FROM rows_h
ORDER BY prev_type
""",
    tags=("events", "markov", "entropy"),
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov entropy rate of the event-type process:
    per current type s, H(next|s) = -Σ_t p(t|s)·log₂ p(t|s) over the
    observed transition counts, plus the stationary-weighted
    contribution π(s)·H(next|s) whose sum over rows is the process
    entropy rate (Cover & Thomas eq. 4.27, estimated from empirical
    transitions). Near-zero rate = deterministic user journeys;
    log₂(|types|) = memoryless.

    Scale shape: ONE lead() window per user history (the single
    full-data shuffle, on user_id), then a combinable count into at
    most |types|² = 25 transition cells; the conditional-probability
    and total windows partition those 25 (then 5) rows — the
    aggregate-bounded window class the plan CI whitelists."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    trans = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("o")
    )
    row_w = Window.partitionBy("prev_type")
    p = F.col("o") / F.sum("o").over(row_w).cast("double")
    per_cell = trans.select(
        "prev_type", "o", (-p * F.log2(p)).alias("h_term")
    )
    rows_h = per_cell.groupBy("prev_type").agg(
        F.sum("o").cast("bigint").alias("n_trans"),
        F.sum("h_term").alias("_h"),
    )
    total_w = Window.partitionBy()
    return rows_h.select(
        "prev_type",
        "n_trans",
        F.round("_h", 4).alias("h_bits"),
        F.round(
            F.col("_h") * F.col("n_trans") / F.sum("n_trans").over(total_w).cast("double"),
            4,
        ).alias("contrib_bits"),
    ).orderBy("prev_type")


@register(
    "events_rolling_zscore",
    oracle=f"""
WITH scored AS (
    SELECT user_id, event_id, value,
           AVG(value) OVER w AS mu,
           STDDEV_SAMP(value) OVER w AS sd,
           COUNT(value) OVER w AS n_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING)
),
z AS (
    SELECT user_id, event_id, value,
           (value - mu) / sd AS zval
    FROM scored
    WHERE n_prev >= {ZSCORE_MIN_N} AND sd > 0
)
SELECT user_id, event_id,
       ROUND(value, 2) AS value,
       ROUND(zval, 4) AS z
FROM z
ORDER BY ROUND(ABS(zval), 6) DESC, event_id
LIMIT {ZSCORE_TOPK}
""",
    tags=("events", "anomaly", "zscore"),
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection: each event's value
    is scored against the mean/stddev of its user's previous
    {ZSCORE_WINDOW} events (current row EXCLUDED — the
    leave-current-out control-chart form, so a spike cannot mask
    itself), events with fewer than {ZSCORE_MIN_N} trailing points or
    zero variance are unscored, and the {ZSCORE_TOPK} largest |z|
    anomalies are reported. The sort key is |z| ROUNDED to 6 places
    with event_id tie-break, so the top-k boundary cannot flip on the
    engines' last-ulp stddev disagreement.

    Scale shape: mean/std/count share ONE window frame over ONE
    partitionBy(user_id) shuffle (Spark computes all three in a
    single WindowExec pass); the global top-k is
    TakeOrderedAndProject — per-partition heads then a k-row merge,
    never a full sort."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_WINDOW, -1)
    )
    scored = ev.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("value").over(w).alias("n_prev"),
    ).where((F.col("n_prev") >= ZSCORE_MIN_N) & (F.col("sd") > 0))
    z = scored.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        ((F.col("value") - F.col("mu")) / F.col("sd")).alias("_zraw"),
    )
    return (
        z.select(
            "user_id",
            "event_id",
            "value",
            F.round("_zraw", 4).alias("z"),
            F.round(F.abs("_zraw"), 6).alias("_zabs"),
        )
        .orderBy(F.col("_zabs").desc(), "event_id")
        .limit(ZSCORE_TOPK)
        .drop("_zabs")
    )
