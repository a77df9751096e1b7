"""Two-phase (stable + anneal) mixing schedule (SURVEY.md §2B
curation tier, round 11, post-window).

One static mix is round-10's curation_mix_knapsack / temperature
reweighting; current practice adds a PHASE SCHEDULE: a long stable
phase on the proportional mix, then a short final "anneal"/decay phase
that upweights the highest-quality sources (public recipes: MiniCPM's
two-stage WSD data schedule, Llama 3's final-phase data annealing —
both described in their public reports). The plan computes both
phases' per-source shares from one pass:

  stable share_s  ∝ tokens_s                 (proportional)
  anneal share_s  ∝ tokens_s * quality_s^GAMMA (quality-tilted)

with quality_s = per-source mean unique-token ratio (the in-row
codegen lexical-diversity proxy used across the quality tier) rounded
to 6 BEFORE the tilt so both engines tilt identical doubles. GAMMA=2
keeps the power integer-exact (a multiplication, no POW ulp surface).

Scale shape: ONE combinable per-source aggregate (tokens + quality
moments), two 1-row normalizer aggregates broadcast back, then
|sources|-row arithmetic. No windows, no corpus-sized joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ANNEAL_FRAC = 0.1  # share of the total budget spent in the anneal phase
ANNEAL_GAMMA = 2  # integer quality tilt (q^2 == q*q, ulp-free)


@register(
    "curation_mix_anneal",
    oracle=f"""
WITH per_source AS (
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
           ROUND(AVG(CAST(len(list_distinct(string_split(text, ' ')))
                          AS DOUBLE)
                     / len(string_split(text, ' '))), 6) AS quality
    FROM documents GROUP BY source
),
norms AS (
    SELECT CAST(SUM(tokens) AS DOUBLE) AS tok_total,
           SUM(tokens * quality * quality) AS tilt_total
    FROM per_source
)
SELECT s.source, s.tokens, s.quality,
       ROUND(s.tokens / n.tok_total, 6) AS share_stable,
       ROUND(s.tokens * s.quality * s.quality / n.tilt_total, 6)
           AS share_anneal,
       ROUND((s.tokens * s.quality * s.quality / n.tilt_total)
             / (s.tokens / n.tok_total), 4) AS anneal_boost,
       ROUND((1 - {ANNEAL_FRAC!r}) * n.tok_total * s.tokens / n.tok_total
             + {ANNEAL_FRAC!r} * n.tok_total
               * s.tokens * s.quality * s.quality / n.tilt_total, 2)
           AS blended_tokens
FROM per_source s CROSS JOIN norms n
ORDER BY source
""",
    tags=("curation", "mixing", "anneal", "schedule"),
)
def curation_mix_anneal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source shares for a two-phase schedule: proportional in the
    stable phase, quality^{ANNEAL_GAMMA}-tilted in the final
    {ANNEAL_FRAC:.0%} anneal phase, plus the boost ratio and the
    blended per-source token spend across both phases (budget = one
    corpus epoch). High-diversity sources gain exactly anneal_boost
    during the decay phase — the public two-stage data-schedule shape.

    Scale shape: one combinable per-source aggregate, one 1-row
    normalizer cross, |sources|-row arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(toks)).cast("bigint").alias("tokens"),
        F.round(
            F.avg(
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
            ),
            6,
        ).alias("quality"),
    )
    norms = per_source.agg(
        F.sum("tokens").cast("double").alias("tok_total"),
        F.sum(
            F.col("tokens") * F.col("quality") * F.col("quality")
        ).alias("tilt_total"),
    )
    tilt = F.col("tokens") * F.col("quality") * F.col("quality")
    return (
        per_source.crossJoin(F.broadcast(norms))
        .select(
            "source",
            "tokens",
            "quality",
            F.round(F.col("tokens") / F.col("tok_total"), 6).alias(
                "share_stable"
            ),
            F.round(tilt / F.col("tilt_total"), 6).alias("share_anneal"),
            F.round(
                (tilt / F.col("tilt_total"))
                / (F.col("tokens") / F.col("tok_total")),
                4,
            ).alias("anneal_boost"),
            F.round(
                (1 - ANNEAL_FRAC)
                * F.col("tok_total")
                * F.col("tokens")
                / F.col("tok_total")
                + ANNEAL_FRAC * F.col("tok_total") * tilt / F.col("tilt_total"),
                2,
            ).alias("blended_tokens"),
        )
        .orderBy("source")
    )
