"""Event-analytics plans, second tier: gap sessionization, sequential
path mining, and rolling distinct actives (SURVEY.md §2B event-time
family).

Like `plans/analytics.py`, every shape here is the scale-safe form of
a classic product-analytics query: one shuffle per entity history for
the window passes, equi-join/equi-group expansions instead of range
self-joins, and combinable aggregates everywhere else. The reference
(SidetrekAI/target-iceberg, write-only) has no query surface; these
are engine extensions over the `events` table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "events_sessionize_gap",
    oracle="""
WITH o AS (
    SELECT user_id, event_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
marked AS (
    SELECT user_id, event_id, ts,
           CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM o
),
numbered AS (
    SELECT user_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT)
               AS session_idx
    FROM marked
)
SELECT user_id, session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
FROM numbered
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
""",
    tags=("events", "session"),
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap sessionization in batch SQL: an event starts a
    new session when it is its user's first or arrives more than 30
    minutes after the previous one; the running sum of those
    boundary flags is the session index, and sessions aggregate to
    (count, start, duration-in-µs).

    This is the window-function twin of the built-in session_window
    used by `stream_session` — the form a warehouse uses when it also
    needs the session ids on the detail rows. Scale shape: lag and the
    running sum share ONE partitionBy(user_id) ordering, so Spark
    plans a single hash-partition shuffle + one sort for both windows,
    and the final per-session rollup is a combinable groupBy. No
    self-join, no range join; survives billions of events with
    power-law users because the widest frame is one user's history.
    Duration is an exact integer µs delta (unix_micros both engines),
    avoiding float epoch truncation skew."""
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("ts").over(order_w).alias("_prev_ts"),
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("_prev_ts").isNull()
            | (F.col("ts") > F.col("_prev_ts") + F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    numbered = marked.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    return (
        numbered.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            ).alias("dur_us"),
        )
        .orderBy("user_id", "session_idx")
    )


@register(
    "events_path_topk",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           LEAD(event_type, 1) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS t2,
           LEAD(event_type, 2) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS t3
    FROM events
)
SELECT event_type || '>' || t2 || '>' || t3 AS path,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq
WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY path
ORDER BY n DESC, path
LIMIT 20
""",
    tags=("events", "sequence"),
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k behavioral trigrams: every run of 3 consecutive events a
    user performs becomes a `a>b>c` path, counted corpus-wide — the
    common-journeys / next-action mining pass of a telemetry pipeline.

    Scale shape: two lead() calls over the SAME per-user ordering
    (one shuffle + one sort), then a combinable path count with
    map-side partial aggregation — the path domain is |event_types|³,
    tiny regardless of event volume — finished by
    TakeOrderedAndProject for the top-k (no global sort). The naive
    alternative (collect each user's history to a list and explode
    n-grams) materializes power-law users' whole histories in one
    task; the window form never holds more than the sort run."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@register(
    "events_active_rolling",
    oracle="""
WITH du AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
bounds AS (
    SELECT MIN(CAST(ts AS DATE)) AS min_d, MAX(CAST(ts AS DATE)) AS max_d
    FROM events
),
contrib AS (
    SELECT CAST(du.d + (g.i * INTERVAL 1 DAY) AS DATE) AS day, du.user_id
    FROM du CROSS JOIN (SELECT UNNEST(range(0, 7)) AS i) g
)
SELECT c.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
FROM contrib c, bounds b
WHERE c.day BETWEEN b.min_d AND b.max_d
GROUP BY c.day
ORDER BY c.day
""",
    tags=("events", "window", "distinct"),
)
def events_active_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per calendar day — the
    classic sliding COUNT DISTINCT no window frame can express
    (count(distinct) over RANGE is unsupported in both engines).

    Scale shape: dedup to (day, user) pairs first (combinable
    distinct, cardinality ≤ days × users regardless of event volume),
    then EXPLODE each pair into the ≤7 future days it contributes to
    (a bounded 7× fan-out of the already-deduped pairs) and finish
    with a combinable distinct-count per day. This turns the sliding
    window into an equi-GROUP BY — no range self-join, so no
    BroadcastNestedLoopJoin at any scale. The date bounds are a 1-row
    aggregate broadcast into the filter."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.col("ts").cast("date").alias("d"), "user_id").distinct()
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("min_d"),
        F.max(F.col("ts").cast("date")).alias("max_d"),
    )
    contrib = du.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("day"),
        "user_id",
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .where(F.col("day").between(F.col("min_d"), F.col("max_d")))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .orderBy("day")
    )


@register(
    "events_attribution",
    oracle="""
WITH marked AS (
    SELECT user_id, event_id, ts, event_type,
           LAG(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS last_touch
    FROM events
)
SELECT COALESCE(last_touch, '(none)') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM marked
WHERE event_type = 'purchase'
GROUP BY channel
ORDER BY channel
""",
    tags=("events", "attribution"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent preceding non-purchase event type (the 'channel') in the
    user's history — lag(... IGNORE NULLS) over one per-user ordering,
    then a combinable count per channel. The IGNORE NULLS navigation
    is the key primitive: it skips arbitrarily long runs of purchases
    without a self-join or per-row subquery, so the cost stays one
    shuffle + one sort per user history at any scale. Purchases with
    no preceding touch attribute to '(none)'."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        # lag(... IGNORE NULLS) spelled as last(..., ignorenulls) over
        # the preceding-rows frame (F.lag has no ignorenulls parameter)
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("last_touch"),
    )
    return (
        marked.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("last_touch", F.lit("(none)")).alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("channel")
    )


@register(
    "events_streaks",
    oracle="""
WITH du AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
grp AS (
    SELECT user_id, d,
           d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                    AS INT) AS island
    FROM du
),
islands AS (
    SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
    FROM grp GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS max_streak_days
FROM islands
GROUP BY user_id
ORDER BY user_id
""",
    tags=("events", "streaks"),
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, runs of CONSECUTIVE active days
    collapse to islands via the classic day - row_number() constant
    (consecutive days share it, any gap shifts it), then per-user
    streak count and longest streak. Scale shape: dedup to (user, day)
    first — cardinality ≤ users × days regardless of event volume —
    then ONE per-user window and two combinable aggregates; the
    self-join formulation of islands is never needed."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = du.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    islands = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("max_streak_days"),
        )
        .orderBy("user_id")
    )


@register(
    "events_interarrival",
    oracle="""
WITH gaps AS (
    SELECT event_type,
           epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id)) AS gap_us
    FROM events
)
SELECT event_type,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) // COUNT(gap_us) AS BIGINT) AS avg_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
    tags=("events", "interarrival"),
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile: the gap between a user's
    consecutive same-type events, aggregated per type (count / mean /
    max in exact integer µs). The window partitions by
    (user_id, event_type) — NOT by event_type alone, which would funnel
    each type's entire global history through one task; the per-type
    rollup afterwards is a combinable 5-row aggregate. Mean is an
    EXACT integer floor-division of an exact integer sum — Spark sums
    the gaps as decimal(38,0) and `div`s (no double AVG whose last-ulp
    order sensitivity would flip FLOOR once the per-type sum crosses
    2^53), DuckDB sums to HUGEINT and `//`s — so the two engines agree
    bit-for-bit at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.expr("sum(cast(gap_us as decimal(38,0))) div count(gap_us)")
            .cast("bigint")
            .alias("avg_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )
