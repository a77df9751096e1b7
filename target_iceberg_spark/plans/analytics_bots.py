"""Bot/automation detection heuristics (SURVEY.md §2B events tier +
curation north star, round 8).

Training-data pipelines filter automated traffic before anything else
touches the corpus; the standard first-pass heuristics (public
folklore, e.g. the Bot or Not features of Chu et al. 2012) are
TIMING REGULARITY — humans have bursty, high-variance inter-arrival
gaps, schedulers fire on the dot — and ACTION DIVERSITY — scripts
repeat one action, humans mix. This query computes both per user
(inter-arrival coefficient of variation, action-type entropy, event
rate) and reports the most machine-like accounts.

Companion signals already in the tier: events_interarrival (the
distribution this thresholds), events_burst (the opposite tail),
profile_entropy (the column-level cousin of the per-user entropy).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

BOT_MIN_EVENTS = 20
BOT_TOP = 20
BOT_CV_MAX = 0.5  # flag: gaps more regular than this CV
BOT_ENT_MAX = 1.0  # flag: action entropy (nats) below this


@register(
    "events_bot_score",
    oracle=f"""
WITH ordered AS (
    SELECT user_id, event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
),
timing AS (
    SELECT user_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
           AVG(gap_us) AS mg,
           stddev_samp(gap_us) AS sg
    FROM ordered WHERE gap_us IS NOT NULL
    GROUP BY user_id
),
tc AS (
    SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS c
    FROM events GROUP BY user_id, event_type
),
tot AS (SELECT user_id, SUM(c) AS s FROM tc GROUP BY user_id),
ent AS (
    SELECT tc.user_id, -SUM((c / s) * ln(c / s)) AS h
    FROM tc JOIN tot USING (user_id) GROUP BY tc.user_id
)
SELECT t.user_id, t.n_events,
       ROUND(t.sg / t.mg, 4) AS cv_gap,
       ROUND(e.h, 4) AS type_entropy,
       (t.sg / t.mg < {BOT_CV_MAX} OR e.h < {BOT_ENT_MAX}) AS is_suspect
FROM timing t JOIN ent e USING (user_id)
WHERE t.n_events >= {BOT_MIN_EVENTS}
ORDER BY ROUND(t.sg / t.mg, 4), t.user_id
LIMIT {BOT_TOP}
""",
    tags=("events", "curation", "bot-detection"),
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user automation heuristics: inter-arrival CV (σ/μ of the
    per-user event gaps — schedulers score near 0, humans well above
    1), action-type Shannon entropy (scripts repeat one action), with
    a composite is_suspect flag (CV < {BOT_CV_MAX} or entropy <
    {BOT_ENT_MAX}); the {BOT_TOP} most regular high-volume users are
    reported — the filter list a corpus-curation pass would review
    and drop.

    Scale shape: the gap window partitions by user (never global);
    both feature tables are combinable aggregates keyed by user and
    join 1:1 on the user key; the finisher is
    TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    timing = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_events"),
        F.avg("gap_us").alias("mg"),
        F.stddev_samp("gap_us").alias("sg"),
    )
    tc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = Window.partitionBy("user_id")
    ent = (
        tc.withColumn("p", F.col("c") / F.sum("c").over(tot))
        .groupBy("user_id")
        .agg((-F.sum(F.col("p") * F.log("p"))).alias("h"))
    )
    cv = F.col("sg") / F.col("mg")
    return (
        timing.join(ent, "user_id")
        .where(F.col("n_events") >= BOT_MIN_EVENTS)
        .select(
            "user_id",
            "n_events",
            F.round(cv, 4).alias("cv_gap"),
            F.round("h", 4).alias("type_entropy"),
            ((cv < BOT_CV_MAX) | (F.col("h") < BOT_ENT_MAX)).alias(
                "is_suspect"
            ),
        )
        .orderBy("cv_gap", "user_id")
        .limit(BOT_TOP)
    )
