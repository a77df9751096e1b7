"""Iterative proportional fitting over the (lang, source) grid
(SURVEY.md §2B curation tier, round-6 post-window).

curation_domain_mix reweights ONE dimension; balancing a corpus on
TWO dimensions at once (language x source, so no cell is over-drawn
when both quotas bind) is the classic raking / IPF problem (Deming &
Stephan 1940, public — the survey-weighting standard). The key scale
property this plan demonstrates: after ONE combinable count over the
corpus, every IPF round runs on the contingency table itself (at most
|langs| x |sources| rows), so the iteration costs nothing at 100 TB —
the corpus is never rescanned.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

IPF_ROUNDS = 3


def _ipf_round_sql(i: int) -> str:
    return f"""
r{i} AS (
    SELECT lang, source, n,
           w * (SELECT t_lang FROM targets)
             / SUM(w * n) OVER (PARTITION BY lang) AS w
    FROM w{i - 1}
),
w{i} AS (
    SELECT lang, source, n,
           w * (SELECT t_source FROM targets)
             / SUM(w * n) OVER (PARTITION BY source) AS w
    FROM r{i}
)"""


@register(
    "curation_ipf_raking",
    oracle=f"""
WITH cells AS (
    SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS n
    FROM documents GROUP BY lang, source
),
targets AS (
    SELECT SUM(n) / COUNT(DISTINCT lang) AS t_lang,
           SUM(n) / COUNT(DISTINCT source) AS t_source
    FROM cells
),
w0 AS (SELECT lang, source, n, CAST(1.0 AS DOUBLE) AS w FROM cells),
{",".join(_ipf_round_sql(i) for i in range(1, IPF_ROUNDS + 1))}
SELECT lang, source, CAST(n AS BIGINT) AS n_docs,
       ROUND(w, 6) AS weight,
       ROUND(w * n, 2) AS expected_docs
FROM w{IPF_ROUNDS}
ORDER BY lang, source
""",
    tags=("curation", "raking", "mixing"),
)
def curation_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{IPF_ROUNDS} rounds of raking on the (lang, source) document
    grid toward UNIFORM marginals on both axes: each round rescales
    cell weights so weighted language totals match, then weighted
    source totals match — the alternating-projection iteration whose
    fixpoint balances both quotas simultaneously (impossible with
    either single-axis reweighting alone). Output is the per-cell
    sampling weight and the expected post-resample cell size a
    curation pass would draw.

    Scale shape: ONE combinable (lang, source) count is the only stage
    that touches the corpus; the targets are a one-row aggregate OVER
    THE GRID; every IPF round is two windowed normalizations
    partitioned by an axis of the |langs| x |sources| table — at
    100 TB the iteration runs on at most a few hundred rows while the
    corpus sleeps. Weights are exact-count rationals through
    deterministic alternating division; ROUND at the end only."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    targets = cells.agg(
        (F.sum("n") / F.countDistinct("lang")).alias("t_lang"),
        (F.sum("n") / F.countDistinct("source")).alias("t_source"),
    )
    w = cells.crossJoin(F.broadcast(targets)).withColumn("w", F.lit(1.0))
    from pyspark.sql import Window

    by_lang = Window.partitionBy("lang")
    by_source = Window.partitionBy("source")
    for _ in range(IPF_ROUNDS):
        w = w.withColumn(
            "w",
            F.col("w")
            * F.col("t_lang")
            / F.sum(F.col("w") * F.col("n")).over(by_lang),
        )
        w = w.withColumn(
            "w",
            F.col("w")
            * F.col("t_source")
            / F.sum(F.col("w") * F.col("n")).over(by_source),
        )
    return w.select(
        "lang",
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round("w", 6).alias("weight"),
        F.round(F.col("w") * F.col("n"), 2).alias("expected_docs"),
    ).orderBy("lang", "source")
