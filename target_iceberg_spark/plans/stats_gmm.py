"""Two-component Gaussian mixture via unrolled EM (SURVEY.md §2B
stats tier, round 10).

The stats tier models means, variances, trends and tests — but not
DENSITY: "is this metric bimodal, and where are the modes?" is the
mixture question (bot-vs-human latencies, two-population spend). EM
for a 1-D two-component GMM (Dempster, Laird & Rubin 1977, public)
distributes exactly like k-means-with-soft-assignments: the E-step is
a per-row closed form against broadcast parameters, the M-step is one
combinable weighted-moment aggregate. Two iterations unroll into the
plan the same way emb_kmeans unrolls Lloyd steps; initialization is
deterministic (components seeded at the 25th/75th percentiles with
the pooled sd), and responsibilities ROUND to 6 before every M-step
sum so both engines accumulate identical values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

GMM_ITERS = 2  # unrolled EM steps (each = 1 broadcast + 1 aggregate)


def _oracle_sql() -> str:
    # E-step responsibility of component 1 given params p (prefix):
    def resp(p: str) -> str:
        d1 = f"EXP(-POW(v - {p}mu1, 2) / (2 * {p}s2)) * {p}w1"
        d2 = f"EXP(-POW(v - {p}mu2, 2) / (2 * {p}s2)) * (1 - {p}w1)"
        return f"ROUND(({d1}) / (({d1}) + ({d2})), 6)"

    # Every M-step output ROUNDS to 6 before feeding the next E-step:
    # cross-engine sum-order ulps die at each iteration boundary, so
    # both engines present identical parameters to every E-step and
    # the rounded responsibilities match row-for-row.
    return f"""
WITH x AS (SELECT value AS v FROM events),
init AS (
    SELECT ROUND(quantile_cont(v, 0.25), 6) AS mu1,
           ROUND(quantile_cont(v, 0.75), 6) AS mu2,
           ROUND(VAR_SAMP(v), 6) AS s2,
           0.5 AS w1
    FROM x
),
r1 AS (
    SELECT x.v, {resp("i.")} AS g
    FROM x CROSS JOIN init i
),
p1 AS (
    SELECT ROUND(SUM(g) / COUNT(*), 6) AS w1,
           ROUND(SUM(g * v) / SUM(g), 6) AS mu1,
           ROUND(SUM((1 - g) * v) / SUM(1 - g), 6) AS mu2
    FROM r1
),
p1s AS (
    SELECT p.w1, p.mu1, p.mu2,
           ROUND((SUM(r.g * POW(r.v - p.mu1, 2))
                  + SUM((1 - r.g) * POW(r.v - p.mu2, 2))) / COUNT(*), 6) AS s2
    FROM r1 r CROSS JOIN p1 p
    GROUP BY p.w1, p.mu1, p.mu2
),
r2 AS (
    SELECT x.v, {resp("p.")} AS g
    FROM x CROSS JOIN p1s p
),
p2 AS (
    SELECT ROUND(SUM(g) / COUNT(*), 6) AS w1,
           ROUND(SUM(g * v) / SUM(g), 6) AS mu1,
           ROUND(SUM((1 - g) * v) / SUM(1 - g), 6) AS mu2
    FROM r2
),
p2s AS (
    SELECT p.w1, p.mu1, p.mu2,
           ROUND((SUM(r.g * POW(r.v - p.mu1, 2))
                  + SUM((1 - r.g) * POW(r.v - p.mu2, 2))) / COUNT(*), 6) AS s2
    FROM r2 r CROSS JOIN p2 p
    GROUP BY p.w1, p.mu1, p.mu2
)
SELECT ROUND(w1, 6) AS weight1, ROUND(mu1, 6) AS mean1,
       ROUND(mu2, 6) AS mean2, ROUND(SQRT(s2), 6) AS pooled_sd,
       mu1 < mu2 AS ordered_components
FROM p2s
"""


@register(
    "agg_gmm_em",
    oracle=_oracle_sql(),
    tags=("stats", "mixture", "em", "density"),
)
def agg_gmm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{GMM_ITERS} unrolled EM steps for a 1-D two-component GMM over
    event values: deterministic quartile init, per-row E-step against
    broadcast parameters (responsibilities rounded to 6 — the same
    round-before-accumulate discipline as emb_kmeans distances), one
    combinable weighted-moment M-step per iteration with a shared
    pooled variance.

    Scale shape: each iteration is ONE broadcast of a 1-row parameter
    table + ONE map-side-combinable aggregate — no shuffle grows with
    the data, no per-component pass (both components' moments come
    from the same aggregate). The plan IS the iteration count; a
    production fit loops the same two operators to convergence."""

    def resp(v, mu1, mu2, s2, w1):
        d1 = F.exp(-F.pow(v - mu1, F.lit(2)) / (2 * s2)) * w1
        d2 = F.exp(-F.pow(v - mu2, F.lit(2)) / (2 * s2)) * (1 - w1)
        return F.round(d1 / (d1 + d2), 6)

    ev = load_table(spark, sf_dir, "events")
    x = ev.select(F.col("value").alias("v"))
    # localCheckpoint each 1-row parameter table (init and per EM
    # step): without it the broadcast-build lineage COMPOUNDS — every
    # E-step re-derives all previous iterations' moment passes, so the
    # corpus-scan count grows with the iteration index instead of
    # staying 2 per step (guide §2.4; the curation_domain_reweight
    # EG-loop discipline).
    params = x.agg(
        F.round(F.expr("percentile(v, 0.25)"), 6).alias("mu1"),
        F.round(F.expr("percentile(v, 0.75)"), 6).alias("mu2"),
        F.round(F.var_samp("v"), 6).alias("s2"),
        F.lit(0.5).alias("w1"),
    ).localCheckpoint()
    for _ in range(GMM_ITERS):
        r = x.crossJoin(F.broadcast(params)).select(
            "v",
            resp(F.col("v"), F.col("mu1"), F.col("mu2"), F.col("s2"), F.col("w1")).alias("g"),
        )
        means = r.agg(
            F.round(F.sum("g") / F.count(F.lit(1)), 6).alias("w1"),
            F.round(F.sum(F.col("g") * F.col("v")) / F.sum("g"), 6).alias("mu1"),
            F.round(
                F.sum((1 - F.col("g")) * F.col("v")) / F.sum(1 - F.col("g")), 6
            ).alias("mu2"),
        ).localCheckpoint()
        params = (
            r.crossJoin(F.broadcast(means))
            .groupBy("w1", "mu1", "mu2")
            .agg(
                F.round(
                    (
                        F.sum(F.col("g") * F.pow(F.col("v") - F.col("mu1"), F.lit(2)))
                        + F.sum(
                            (1 - F.col("g")) * F.pow(F.col("v") - F.col("mu2"), F.lit(2))
                        )
                    )
                    / F.count(F.lit(1)),
                    6,
                ).alias("s2")
            )
            .select("w1", "mu1", "mu2", "s2")
            .localCheckpoint()
        )
    return params.select(
        F.round(F.col("w1"), 6).alias("weight1"),
        F.round(F.col("mu1"), 6).alias("mean1"),
        F.round(F.col("mu2"), 6).alias("mean2"),
        F.round(F.sqrt(F.col("s2")), 6).alias("pooled_sd"),
        (F.col("mu1") < F.col("mu2")).alias("ordered_components"),
    )
