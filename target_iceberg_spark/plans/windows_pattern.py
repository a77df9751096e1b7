"""Row-sequence pattern matching via window lags (SURVEY.md §2B
windows tier, round 9).

The MATCH_RECOGNIZE surface (SQL:2016 row pattern recognition —
Trino/Flink ship it, Spark does not) reduces, for fixed-length
patterns, to lead/lag windows: a pattern of length L is a conjunction
over L-1 lead comparisons anchored at each row. This query runs the
canonical "V-shape" (drop, drop, rebound) scan — the reversal motif
position monitors and UX funnels look for — as pure partitioned
windows, the Spark-native translation of MATCH_RECOGNIZE's
``PATTERN (A DOWN DOWN UP)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

VSHAPE_EVENT = "purchase"
VSHAPE_TOP = 15


@register(
    "win_match_pattern",
    oracle=f"""
WITH s AS (
    SELECT user_id, value,
           LEAD(value, 1) OVER w AS v1,
           LEAD(value, 2) OVER w AS v2,
           LEAD(value, 3) OVER w AS v3
    FROM events
    WHERE event_type = '{VSHAPE_EVENT}'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
hits AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(COUNT(*) FILTER (
               WHERE value > v1 AND v1 > v2 AND v2 < v3
           ) AS BIGINT) AS n_vshapes
    FROM s GROUP BY user_id
)
SELECT user_id, n_anchors, n_vshapes,
       ROUND(CAST(n_vshapes AS DOUBLE) / n_anchors, 6) AS vshape_rate
FROM hits
WHERE n_vshapes > 0
ORDER BY n_vshapes DESC, user_id
LIMIT {VSHAPE_TOP}
""",
    tags=("window", "pattern", "events"),
)
def win_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{VSHAPE_TOP} users by V-shape count over their
    {VSHAPE_EVENT} value sequence: an anchor row matches when
    value > next > next2 < next3 (two declines then a rebound) — the
    fixed-length MATCH_RECOGNIZE pattern expressed as three LEADs in
    ONE window pass.

    Scale shape: a single partitioned window per user (keyed,
    skew-free — the engine's sessionize/streaks discipline), then a
    combinable per-user count; no self-joins, no pattern-automaton
    state. A variable-length pattern would move this to
    applyInPandasWithState (the streaming tier's tool); fixed-length
    patterns belong in the window form because whole-stage codegen
    keeps the comparisons JVM-side."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == VSHAPE_EVENT
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "value",
        F.lead("value", 1).over(w).alias("v1"),
        F.lead("value", 2).over(w).alias("v2"),
        F.lead("value", 3).over(w).alias("v3"),
    )
    hit = (
        (F.col("value") > F.col("v1"))
        & (F.col("v1") > F.col("v2"))
        & (F.col("v2") < F.col("v3"))
    )
    hits = s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_vshapes"),
    )
    return (
        hits.where(F.col("n_vshapes") > 0)
        .select(
            "user_id",
            "n_anchors",
            "n_vshapes",
            F.round(
                F.col("n_vshapes").cast("double") / F.col("n_anchors"), 6
            ).alias("vshape_rate"),
        )
        .orderBy(F.desc("n_vshapes"), "user_id")
        .limit(VSHAPE_TOP)
    )
