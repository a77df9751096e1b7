"""Corpus diversity indices (SURVEY.md §2B curation tier, round 7).

A training-data curation report needs more than counts per slice: it
needs DIVERSITY numbers — how concentrated is each source's language
mix, how many "effective" languages does it really contribute? This
module adds the two standard indices side by side: Shannon entropy
(with its exponential, Hill number q=1 / MacArthur's effective
species count) and the Gini–Simpson index (Simpson 1949) — the same
pair ecology uses for species diversity, applied to corpus slices.

The reference (ingestion-only) has no query surface; this extends
the curation tier (domain mix, corpus report, PII audit, IPF raking).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "curation_diversity_index",
    oracle="""
WITH cells AS (
    SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents
    GROUP BY source, lang
),
probs AS (
    SELECT source, lang, n,
           n / CAST(SUM(n) OVER (PARTITION BY source) AS DOUBLE) AS p
    FROM cells
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       ROUND(-SUM(p * log2(p)), 4) AS shannon_bits,
       ROUND(1.0 - SUM(p * p), 4) AS gini_simpson,
       ROUND(POW(2.0, -SUM(p * log2(p))), 4) AS effective_langs
FROM probs
GROUP BY source
ORDER BY source
""",
    tags=("curation", "diversity", "corpus"),
)
def curation_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-diversity report: Shannon entropy
    H = -Σ p·log₂p over the source's language mix, the Gini–Simpson
    index 1-Σp² (probability two random docs differ in language), and
    the Hill number 2^H — the "effective language count" a curator
    compares against the raw n_langs to see concentration (10 langs
    at effective 1.3 = a monolingual source with trace contamination).

    Scale shape: ONE combinable (source, lang) count is the only
    full-data stage; the per-source share window and final rollup run
    over |sources|×|langs| rows (the aggregate-bounded window class).
    Identical arithmetic both engines: p is an exact integer ratio,
    log2/pow round at 4 places."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    p = F.col("n") / F.sum("n").over(Window.partitionBy("source")).cast("double")
    probs = cells.select("source", "n", p.alias("p"))
    return (
        probs.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            (-F.sum(F.col("p") * F.log2("p"))).alias("_h"),
            (F.lit(1.0) - F.sum(F.col("p") * F.col("p"))).alias("_gs"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            F.round("_h", 4).alias("shannon_bits"),
            F.round("_gs", 4).alias("gini_simpson"),
            F.round(F.pow(F.lit(2.0), F.col("_h")), 4).alias("effective_langs"),
        )
        .orderBy("source")
    )
