"""Kneser-Ney perplexity FILTER — the apply stage of the KN model
(SURVEY.md §2B text/curation tier, round 11).

text_kneser_ney (plans/text_kneser_ney.py) fits the model and reports
per-source cross-entropy; the reason pipelines build KN models is the
FILTERING stage — CCNet (Wenzek et al. 2019, public) scores every doc's
perplexity under a reference LM and drops the worst tail. This query
scores each document's bigrams against the same corpus-fit model
(literally the shared scoring plan / SQL CTEs), rounds the per-doc mean
nll, and applies a kill threshold expressed in cross-entropy space.

Determinism note: the kill decision compares the ROUNDED per-doc ce
against the plan-literal KN_CE_MAX — never exp() output — so both
engines decide from identical doubles; perplexity itself is reported
rounded for humans but carries no control flow.

Scale shape: inherited from the fit — model tables are Zipf/vocabulary
bounded, the scoring join shuffles bigram occurrences against bounded
count tables, and both rollups (per-doc, then per-source) are
combinable aggregates. The filter adds zero new corpus-sized stages.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.text_kneser_ney import KN_SCORED_CTES, kn_scored

KN_PPL_MAX = 30.5  # kill docs with perplexity above this
# The decision literal: ce > ln(KN_PPL_MAX), rounded to the same 6-dp
# grain as the per-doc ce, computed ONCE in Python so plan and oracle
# share one double.
KN_CE_MAX = round(math.log(KN_PPL_MAX), 6)


@register(
    "text_kn_perplexity",
    oracle=f"""
WITH {KN_SCORED_CTES},
per_doc AS (
    SELECT source, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bg,
           ROUND(AVG(nll), 6) AS ce
    FROM scored GROUP BY source, doc_id
),
flagged AS (
    SELECT source, n_bg, ce,
           CASE WHEN ce > {KN_CE_MAX!r} THEN 1 ELSE 0 END AS killed
    FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(killed) AS BIGINT) AS n_killed,
       ROUND(AVG(killed), 4) AS kill_rate,
       CAST(SUM(CASE WHEN killed = 0 THEN n_bg ELSE 0 END) AS BIGINT)
           AS bigrams_kept,
       ROUND(AVG(CASE WHEN killed = 0 THEN EXP(ce) END), 4)
           AS mean_ppl_kept,
       ROUND(AVG(CASE WHEN killed = 1 THEN EXP(ce) END), 4)
           AS mean_ppl_killed
FROM flagged GROUP BY source ORDER BY source
""",
    tags=("text", "lm", "quality", "curation", "filter"),
)
def text_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source kill rates when the corpus-fit KN bigram model is
    applied as a CCNet-style perplexity filter at ppl > {KN_PPL_MAX}
    (decided in rounded cross-entropy space against the plan literal
    {KN_CE_MAX}): docs killed, bigram volume kept, and mean perplexity
    on both sides of the cut.

    Scale shape: the shared scoring stage (kn_scored) does all the
    work; this adds one combinable per-doc aggregate and one per-source
    rollup — no windows, no new shuffles over the corpus."""
    scored = kn_scored(spark, sf_dir)
    per_doc = scored.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bg"),
        F.round(F.avg("nll"), 6).alias("ce"),
    )
    flagged = per_doc.select(
        "source",
        "n_bg",
        "ce",
        F.when(F.col("ce") > KN_CE_MAX, 1).otherwise(0).alias("killed"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("killed").cast("bigint").alias("n_killed"),
            F.round(F.avg("killed"), 4).alias("kill_rate"),
            F.sum(
                F.when(F.col("killed") == 0, F.col("n_bg")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("bigrams_kept"),
            F.round(
                F.avg(F.when(F.col("killed") == 0, F.exp(F.col("ce")))), 4
            ).alias("mean_ppl_kept"),
            F.round(
                F.avg(F.when(F.col("killed") == 1, F.exp(F.col("ce")))), 4
            ).alias("mean_ppl_killed"),
        )
        .orderBy("source")
    )
