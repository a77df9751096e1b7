"""Empirical-Bayes shrinkage of per-entity rates (SURVEY.md §2B stats
tier, round 9).

Ranking entities by raw success rate is dominated by small-sample
noise: a 3/3 user beats a 180/200 one. The standard industrial fix is
beta-binomial empirical Bayes (Robbins 1956; Efron & Morris 1975 —
public): fit a Beta(alpha, beta) prior to the observed rate
distribution by method of moments, then rank by the posterior mean
(x + alpha)/(n + alpha + beta) — exactly how leaderboards, CTR ranks,
and data-quality scores are stabilized at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

EB_TOP = 10


@register(
    "agg_eb_shrinkage",
    oracle=f"""
WITH u AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                AS BIGINT) AS n_purchases,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                AS DOUBLE) / COUNT(*) AS raw_rate
    FROM events GROUP BY user_id
),
prior AS (
    SELECT AVG(raw_rate) AS m,
           VAR_SAMP(raw_rate) AS v,
           AVG(raw_rate) * (AVG(raw_rate) * (1 - AVG(raw_rate))
                            / VAR_SAMP(raw_rate) - 1) AS alpha,
           (1 - AVG(raw_rate)) * (AVG(raw_rate) * (1 - AVG(raw_rate))
                                  / VAR_SAMP(raw_rate) - 1) AS beta
    FROM u
)
SELECT user_id, n_events, n_purchases,
       ROUND(raw_rate, 6) AS raw_rate,
       ROUND((n_purchases + alpha) / (n_events + alpha + beta), 6)
           AS shrunk_rate,
       ROUND(alpha, 6) AS prior_alpha,
       ROUND(beta, 6) AS prior_beta
FROM u, prior
ORDER BY shrunk_rate DESC, user_id
LIMIT {EB_TOP}
""",
    tags=("stats", "experimentation", "bayes"),
)
def agg_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{EB_TOP} users by empirical-Bayes-shrunk purchase rate: a
    Beta prior fit by method of moments on the per-user rate
    distribution (K = m(1-m)/v - 1; alpha = mK, beta = (1-m)K), then
    posterior-mean ranking. The prior parameters ride along so the
    output documents the fitted prior, not just the ranks.

    Scale shape: two combinable aggregates — per-user conditional
    counts, then the one-row moment fold over users — and a broadcast
    of that one prior row back onto the user frame; the ranking is a
    TakeOrderedAndProject. Nothing is ever quadratic and the prior fit
    costs one extra reduce over already-aggregated rows."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
    )
    u = u.withColumn(
        "raw_rate", F.col("n_purchases").cast("double") / F.col("n_events")
    )
    m, v = F.avg("raw_rate"), F.var_samp("raw_rate")
    k = m * (1 - m) / v - 1
    prior = u.agg(
        (m * k).alias("alpha"),
        ((1 - m) * k).alias("beta"),
    )
    return (
        u.crossJoin(F.broadcast(prior))
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            F.round("raw_rate", 6).alias("raw_rate"),
            F.round(
                (F.col("n_purchases") + F.col("alpha"))
                / (F.col("n_events") + F.col("alpha") + F.col("beta")),
                6,
            ).alias("shrunk_rate"),
            F.round("alpha", 6).alias("prior_alpha"),
            F.round("beta", 6).alias("prior_beta"),
        )
        .orderBy(F.desc("shrunk_rate"), "user_id")
        .limit(EB_TOP)
    )
