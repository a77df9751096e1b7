"""Keyed interval join — the batch twin of the stream-stream join
(streaming/pipeline.py::interval_join).

Attribution shape: each purchase joins the clicks of the SAME user in
the preceding hour. Physically an equi-join on the user key with a
residual time-range predicate — per-key event volume is bounded, so
the shuffle partitions by user and the range check is a filter, never
a cross product. In streaming form the same plan runs as Spark's
watermarked stream-stream join, whose state retention is derived from
the interval bound; equivalence on bounded input is asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


def _attribution_join(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    """Shared purchase→click attribution shape for the inner and left
    variants: same projections, same equi+range condition, differing
    only in join type (mirrors streaming/pipeline.py::interval_join)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        how,
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


@register(
    "stream_join_interval",
    oracle="""
SELECT p.user_id,
       p.event_id AS purchase_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       c.event_id AS click_id,
       CAST(c.ts AS TIMESTAMP) AS click_ts
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
  AND c.event_type = 'click'
""",
    tags=("streaming", "join", "interval"),
)
def stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to same-user clicks within the prior hour."""
    return _attribution_join(spark, sf_dir, "inner")


@register(
    "stream_join_left",
    oracle="""
SELECT p.user_id,
       p.event_id AS purchase_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       c.event_id AS click_id,
       CAST(c.ts AS TIMESTAMP) AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
""",
    tags=("streaming", "join", "interval", "outer"),
)
def stream_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join: every purchase appears, with NULL click
    columns when no same-user click landed in the preceding hour — the
    attribution query that must not drop unattributed conversions.

    The streaming twin (streaming/pipeline.py::interval_join_left) is
    Spark's watermarked stream-stream LEFT join, where unmatched left
    rows are held in state and emitted with NULLs only once the global
    watermark passes their join window — the state-finalization
    semantics this batch twin's results pin down on bounded input."""
    return _attribution_join(spark, sf_dir, "left")
