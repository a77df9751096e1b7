"""Repetition (multi-epoch) schedule under a token budget (SURVEY.md
§2B curation tier, round 11, post-window).

The mixing tier answers "how much of each source" (temperature,
knapsack, DSIR); when the corpus is SMALLER than the budget the
question inverts: how many EPOCHS of each source, knowing repeated
tokens are worth less (Muennighoff et al., "Scaling Data-Constrained
Language Models", NeurIPS 2023 — public: value decays roughly
geometrically with epochs and ~4 epochs is the useful ceiling).

Plan: per-source token counts (one combinable aggregate), a uniform
per-source share of BUDGET_X x total corpus tokens, epochs =
min(EPOCH_CAP, share / tokens), and the effective (value-weighted)
token yield under a geometric per-epoch value decay
DECAY^(epoch - 1):

    effective = T * (1 - DECAY^floor(E)) / (1 - DECAY)
              + (E - floor(E)) * T * DECAY^floor(E)

Budget is expressed as a MULTIPLE of the corpus so the schedule is
scale-invariant (literal token counts would stop repeating anything
the moment the corpus outgrew them). Epochs round to 6 before the
yield algebra — both engines run identical doubles downstream, and
DECAY^k for integer k <= EPOCH_CAP is exact binary arithmetic.

Scale shape: everything after the one per-source aggregate runs over
|sources| rows; the share constant is a broadcast 1-row cross. No
windows, no corpus-sized joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

REPEAT_BUDGET_X = 2.5  # budget = this x total corpus tokens
REPEAT_EPOCH_CAP = 4.0  # useful-repetition ceiling
REPEAT_DECAY = 0.5  # per-epoch value decay


@register(
    "curation_repetition_schedule",
    oracle=f"""
WITH per_source AS (
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
    FROM documents GROUP BY source
),
share AS (
    SELECT {REPEAT_BUDGET_X!r} * SUM(tokens) / COUNT(*) AS share_tokens
    FROM per_source
),
sched AS (
    SELECT s.source, s.tokens,
           ROUND(LEAST({REPEAT_EPOCH_CAP!r},
                       sh.share_tokens / s.tokens), 6) AS epochs,
           sh.share_tokens
    FROM per_source s CROSS JOIN share sh
)
SELECT source, tokens, epochs,
       ROUND(tokens * epochs, 2) AS tokens_consumed,
       ROUND(tokens * (1 - POW({REPEAT_DECAY!r}, FLOOR(epochs)))
                 / (1 - {REPEAT_DECAY!r})
             + (epochs - FLOOR(epochs)) * tokens
                 * POW({REPEAT_DECAY!r}, FLOOR(epochs)), 2)
           AS effective_tokens,
       ROUND(tokens * epochs / share_tokens, 4) AS budget_utilization,
       epochs >= {REPEAT_EPOCH_CAP!r} AS capped
FROM sched
ORDER BY source
""",
    tags=("curation", "mixing", "repetition", "budget"),
)
def curation_repetition_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch schedule under a {REPEAT_BUDGET_X}x-corpus
    token budget split uniformly across sources: epochs capped at
    {REPEAT_EPOCH_CAP}, effective value-weighted yield under a
    {REPEAT_DECAY} geometric per-epoch decay, budget utilization, and
    whether the cap binds — small sources repeat to the ceiling, large
    sources underfill their share.

    Scale shape: one combinable token aggregate, then |sources|-row
    arithmetic against a broadcast 1-row share constant."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tokens")
    )
    share = per_source.agg(
        (F.lit(REPEAT_BUDGET_X) * F.sum("tokens") / F.count(F.lit(1))).alias(
            "share_tokens"
        )
    )
    sched = per_source.crossJoin(F.broadcast(share)).select(
        "source",
        "tokens",
        F.round(
            F.least(
                F.lit(REPEAT_EPOCH_CAP),
                F.col("share_tokens") / F.col("tokens"),
            ),
            6,
        ).alias("epochs"),
        "share_tokens",
    )
    full = F.floor(F.col("epochs"))
    decay_pow = F.pow(F.lit(REPEAT_DECAY), full)
    return sched.select(
        "source",
        "tokens",
        "epochs",
        F.round(F.col("tokens") * F.col("epochs"), 2).alias("tokens_consumed"),
        F.round(
            F.col("tokens")
            * (1 - decay_pow)
            / (1 - F.lit(REPEAT_DECAY))
            + (F.col("epochs") - full) * F.col("tokens") * decay_pow,
            2,
        ).alias("effective_tokens"),
        F.round(
            F.col("tokens") * F.col("epochs") / F.col("share_tokens"), 4
        ).alias("budget_utilization"),
        (F.col("epochs") >= REPEAT_EPOCH_CAP).alias("capped"),
    ).orderBy("source")
