"""Audience-overlap matrix (SURVEY.md §2B event analytics, round 7,
post-window).

"How much do the audiences of two behaviors overlap?" drives
cross-sell targeting, cannibalization checks, and funnel design. The
exact answer is a pairwise Jaccard over per-behavior user sets — the
quantity agg_bitmap_distinct approximates with roaring-style bitmaps
and agg_copurchase computes for products; here it is computed exactly
for the |types|² = 25 behavior pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "events_user_overlap",
    oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
sizes AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut
    GROUP BY event_type
),
inter AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
)
SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
       ROUND(CAST(i.n_both AS DOUBLE) / (sa.n + sb.n - i.n_both), 4)
           AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
ORDER BY type_a, type_b
""",
    tags=("events", "overlap", "jaccard"),
)
def events_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience overlap: for every ordered pair of
    event types, |users doing both| and the Jaccard of the two user
    sets — the cross-sell / cannibalization matrix, exact where
    agg_bitmap_distinct's bitmaps would estimate it at extreme
    cardinalities.

    Scale shape: ONE distinct collapses events to (user, type) rows —
    at most |types| per user; the pair join is a SELF EQUI-JOIN ON
    user_id whose per-user fanout is bounded by |types|² = 25 (the
    same bounded-blocking argument as the dedup tier's same-source
    pairing — never all-pairs across users); intersections and set
    sizes are combinable counts and the |types|²-row matrix joins two
    |types|-row size tables at the end. The division is
    integers-in/double-out, rounded."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )
