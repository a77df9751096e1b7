"""Cross-source template mining (SURVEY.md §2B text tier, round 9).

Boilerplate that repeats ACROSS sources — cookie banners, nav chrome,
license footers — is the duplication class per-document filters
(text_repetition) and per-pair near-dup (dedup_minhash) both miss,
and it is exactly what C4/RefinedWeb-style corpus audits mine before
writing dedup rules (Raffel et al. JMLR'20 §2.2, Penedo et al.
NeurIPS'23, both public). This query surfaces the top shared n-gram
templates: word 5-grams that occur in documents from at least
TEMPLATE_MIN_SOURCES distinct sources, ranked by how many documents
carry them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

TEMPLATE_N = 5  # words per template gram
TEMPLATE_MIN_SOURCES = 3  # "template" = seen in >= this many sources
TEMPLATE_TOP = 20


@register(
    "text_cross_source_templates",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT doc_id, source,
           md5(array_to_string(t[i : i + {TEMPLATE_N} - 1], ' ')) AS g,
           array_to_string(t[i : i + {TEMPLATE_N} - 1], ' ') AS gram
    FROM toks,
         LATERAL (SELECT unnest(range(1, len(t) - {TEMPLATE_N} + 2)) AS i)
    WHERE len(t) >= {TEMPLATE_N}
),
agg AS (
    SELECT g, MIN(gram) AS gram,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM grams
    GROUP BY g
    HAVING COUNT(DISTINCT source) >= {TEMPLATE_MIN_SOURCES}
)
SELECT gram, n_sources, n_docs, n_occurrences
FROM agg
ORDER BY n_docs DESC, n_sources DESC, gram
LIMIT {TEMPLATE_TOP}
""",
    tags=("text", "dedup", "curation", "templates"),
)
def text_cross_source_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TEMPLATE_TOP} cross-source template 5-grams: word 5-grams
    present in documents from >= {TEMPLATE_MIN_SOURCES} distinct
    sources, ranked by the number of documents carrying them — the
    corpus-audit view that turns scattered boilerplate into a concrete
    strip-list.

    Scale shape: grams shuffle as 16-byte md5 digests (the gram TEXT
    rides along only to be MIN()-elected per digest for the bounded
    output); n_sources / n_docs are combinable count-distincts over
    low-cardinality pairs, and the template threshold is a HAVING that
    kills the unique-gram long tail (the overwhelming mass) before the
    final TakeOrderedAndProject keeps {TEMPLATE_TOP} rows. At 100 TB
    the digest-keyed aggregate is the same gram-frequency table the
    dup-n-gram filter persists — one artifact serves both."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    toks = F.split("text", " ")
    grams = (
        docs.select("doc_id", "source", toks.alias("t"))
        .where(F.size("t") >= TEMPLATE_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - TEMPLATE_N + 1),
                    lambda i: F.array_join(F.slice("t", i, TEMPLATE_N), " "),
                )
            ).alias("gram"),
        )
        .select("doc_id", "source", "gram", F.md5("gram").alias("g"))
    )
    agg = (
        grams.groupBy("g")
        .agg(
            F.min("gram").alias("gram"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_sources") >= TEMPLATE_MIN_SOURCES)
    )
    return (
        agg.select("gram", "n_sources", "n_docs", "n_occurrences")
        .orderBy(F.desc("n_docs"), F.desc("n_sources"), "gram")
        .limit(TEMPLATE_TOP)
    )
