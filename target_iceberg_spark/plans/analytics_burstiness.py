"""Burstiness and memory of inter-event times (SURVEY.md §2B events
tier, round 9).

Goh & Barabási ("Burstiness and memory in complex systems", EPL 2008,
public) characterize any event stream by two numbers over its
inter-arrival gaps: burstiness B = (sigma - mu)/(sigma + mu) in
[-1, 1] (-1 perfectly periodic, 0 Poisson, ->1 bursty) and the memory
coefficient M = Pearson correlation of consecutive gaps (do long
waits follow long waits?). Human activity sits at B>0, M around 0;
schedulers at B<0; retry storms at B>0, M>0 — the pair separates
failure modes a single rate statistic cannot. events_burst finds
WHEN bursts happen; this query measures HOW bursty the process is.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "events_burstiness",
    oracle="""
WITH g AS (
    SELECT event_type,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap,
           LAG(epoch_us(ts)) OVER w
               - LAG(epoch_us(ts), 2) OVER w AS prev_gap
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       ROUND((STDDEV_SAMP(gap) - AVG(gap))
             / (STDDEV_SAMP(gap) + AVG(gap)), 6) AS burstiness,
       ROUND(CORR(gap, prev_gap), 6) AS memory_coef
FROM g
WHERE gap IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
    tags=("events", "timeseries", "burstiness"),
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási (B, M) per event type over per-(user, type)
    inter-arrival gaps: B = (sd - mean)/(sd + mean) of the gaps and
    M = corr(gap, previous gap) — consecutive-gap pairs come from the
    SAME lag window that produces the gaps (a second LAG, no
    self-join).

    Scale shape: one window partitioned by (user_id, event_type) —
    never by type alone, which would funnel a type's global history
    through one task (the events_interarrival discipline) — then a
    combinable per-type fold of sufficient statistics (count, moments,
    co-moments via CORR). Exact integer-microsecond gaps feed
    double-precision moments; the 6-decimal round absorbs the
    engines' sum-order ulp."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap"),
        (F.lag(us).over(w) - F.lag(us, 2).over(w)).alias("prev_gap"),
    ).where(F.col("gap").isNotNull())
    b = (F.stddev_samp("gap") - F.avg("gap")) / (
        F.stddev_samp("gap") + F.avg("gap")
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.round(b, 6).alias("burstiness"),
            F.round(F.corr("gap", "prev_gap"), 6).alias("memory_coef"),
        )
        .orderBy("event_type")
    )
