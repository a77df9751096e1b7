"""Dataset-card statistics (SURVEY.md §2B curation tier, round 10).

Every released training corpus ships a datasheet ("Datasheets for
Datasets", Gebru et al. CACM 2021; HuggingFace dataset cards —
public): per-split volume, token counts, length distribution,
language spread, duplication rate. Producing one at 100 TB must be a
SINGLE pass, not a notebook of ad-hoc scans — this operator is that
pass: every card number for every source in one combinable aggregate
(plus one distinct-hash sub-aggregate for the dup rate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "curation_dataset_card",
    oracle="""
WITH per_doc AS (
    SELECT source, lang, n_chars,
           len(string_split(lower(text), ' ')) AS n_tokens,
           md5(text) AS h
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(n_chars), 2) AS mean_chars,
       ROUND(quantile_cont(n_chars, 0.5), 1) AS p50_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       ROUND(1.0 - COUNT(DISTINCT h) / CAST(COUNT(*) AS DOUBLE), 6)
           AS exact_dup_rate
FROM per_doc
GROUP BY source
ORDER BY source
""",
    tags=("curation", "profiling", "datasheet"),
)
def curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card in one aggregate: doc and token
    volume, mean and median document length, language spread, and the
    exact-duplicate rate (1 - distinct text hashes / docs) — the
    datasheet numbers a corpus release publishes.

    Scale shape: one combinable groupBy over a projection that
    computes token counts and text hashes map-side; the only
    expand is the two COUNT DISTINCTs (lang — tiny domain — and the
    16-byte md5, which shuffles digests, never text). The exact
    median is the piece approx_percentile replaces at 100 TB; all
    other columns are pure map-side-combinable sums."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens"),
        F.md5(F.col("text")).alias("h"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_chars"), 2).alias("mean_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 1).alias("p50_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.round(
                1.0 - F.countDistinct("h") / F.count(F.lit(1)).cast("double"), 6
            ).alias("exact_dup_rate"),
        )
        .orderBy("source")
    )
