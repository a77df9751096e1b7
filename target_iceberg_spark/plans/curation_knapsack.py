"""Quality-greedy token-budget allocation (SURVEY.md §2B curation
tier, round 10).

curation_token_budget CUTS proportionally; curation_mix_temperature
REWEIGHTS toward uniform; the third mixing decision is OPTIMIZE: given
per-source quality scores and a fixed token budget, allocate tokens to
maximize average quality. With divisible sources this is the
fractional knapsack, whose greedy-by-density solution is provably
optimal (Dantzig 1957, public): sort sources by quality, take whole
sources until the budget breaks, take the boundary source
fractionally. The whole optimizer is a cumulative window over the
|sources|-row aggregate — an optimal solver that costs one bounded
window, which is exactly why the greedy form is the one a 100 TB
pipeline runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

KNAP_BUDGET = 40_000  # token budget to allocate
KNAP_STOPS = ("the", "a", "of", "and", "to")  # quality = stopword share


def _stops_sql() -> str:
    return ", ".join(f"'{w}'" for w in KNAP_STOPS)


@register(
    "curation_mix_knapsack",
    oracle=f"""
WITH per_doc AS (
    SELECT source,
           len(string_split(lower(text), ' ')) AS n_tokens,
           len(list_filter(string_split(lower(text), ' '),
               t -> t IN ({_stops_sql()})))
               / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS q
    FROM documents
),
src AS (
    SELECT source,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           ROUND(AVG(q), 6) AS quality
    FROM per_doc GROUP BY source
),
ranked AS (
    SELECT source, tokens, quality,
           SUM(tokens) OVER (ORDER BY quality DESC, source) AS cum
    FROM src
)
SELECT source, tokens, quality,
       CAST(CASE WHEN cum <= {KNAP_BUDGET} THEN tokens
                 ELSE GREATEST({KNAP_BUDGET} - (cum - tokens), 0)
            END AS BIGINT) AS allocated,
       ROUND(CASE WHEN cum <= {KNAP_BUDGET} THEN 1.0
                  ELSE GREATEST({KNAP_BUDGET} - (cum - tokens), 0)
                       / CAST(tokens AS DOUBLE)
             END, 6) AS take_share
FROM ranked
ORDER BY quality DESC, source
""",
    tags=("curation", "mixing", "optimization", "knapsack"),
)
def curation_mix_knapsack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal fractional-knapsack mix for a {KNAP_BUDGET}-token
    budget: sources ranked by mean quality (stopword share), whole
    sources taken while the running token sum fits, the boundary
    source taken fractionally, everything after allocated zero — the
    provably-optimal divisible-source allocation, with per-source
    allocated tokens and take share.

    Scale shape: ONE combinable per-source aggregate collapses the
    corpus (quality and token counts compute map-side from the token
    array, no explode); the optimizer itself is one cumulative window
    over the |sources|-row table — the declared aggregate-bounded
    unpartitioned-window class. The quality column rounds to 6 before
    ranking so both engines sort identical keys (ties break on source
    name)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(w) for w in KNAP_STOPS])
    per_doc = docs.select(
        "source",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
            / F.size(toks).cast("double")
        ).alias("q"),
    )
    src = per_doc.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("tokens"),
        F.round(F.avg("q"), 6).alias("quality"),
    )
    w = Window.orderBy(F.desc("quality"), "source")
    ranked = src.select("source", "tokens", "quality", F.sum("tokens").over(w).alias("cum"))
    remaining = F.greatest(
        F.lit(KNAP_BUDGET) - (F.col("cum") - F.col("tokens")), F.lit(0).cast("bigint")
    )
    return ranked.select(
        "source",
        "tokens",
        "quality",
        F.when(F.col("cum") <= KNAP_BUDGET, F.col("tokens"))
        .otherwise(remaining)
        .cast("bigint")
        .alias("allocated"),
        F.round(
            F.when(F.col("cum") <= KNAP_BUDGET, F.lit(1.0)).otherwise(
                remaining / F.col("tokens").cast("double")
            ),
            6,
        ).alias("take_share"),
    ).orderBy(F.desc("quality"), "source")
