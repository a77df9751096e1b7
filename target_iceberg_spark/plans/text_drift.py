"""Lexical drift audit (SURVEY.md §2B text tier, round 7,
post-window).

profile_drift_psi tracks drift in NUMERIC columns and
emb_drift_snapshots in embedding space; this closes the triangle with
VOCABULARY drift — the signal a crawl pipeline reads when a source
changes template, language mix, or topic between ingest cohorts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

DRIFT_MIN_DF = 10  # total-df floor: rarer words are noise, not drift
DRIFT_TOP = 25


@register(
    "text_idf_drift",
    oracle=f"""
WITH halves AS (
    SELECT doc_id, text,
           CASE WHEN doc_id < (SELECT (MAX(doc_id) + 1) // 2 FROM documents)
                THEN 0 ELSE 1 END AS half
    FROM documents
),
sizes AS (
    SELECT SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_a,
           SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_b
    FROM halves
),
df AS (
    SELECT word,
           COUNT(DISTINCT CASE WHEN half = 0 THEN doc_id END) AS df_a,
           COUNT(DISTINCT CASE WHEN half = 1 THEN doc_id END) AS df_b
    FROM (SELECT doc_id, half, unnest(string_split(text, ' ')) AS word
          FROM halves)
    GROUP BY word
    HAVING COUNT(DISTINCT doc_id) >= {DRIFT_MIN_DF}
),
scored AS (
    SELECT word, CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
           log2(((df_b + 1.0) / (n_b + 1.0)) / ((df_a + 1.0) / (n_a + 1.0)))
               AS lr
    FROM df, sizes
)
SELECT word, df_a, df_b, ROUND(lr, 4) AS log2_ratio
FROM scored
ORDER BY ROUND(ABS(lr), 6) DESC, word
LIMIT {DRIFT_TOP}
""",
    tags=("text", "drift", "curation"),
)
def text_idf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between ingest cohorts: split the corpus at
    the median doc_id (the ingest-order proxy, as in
    text_ngram_novelty), compute each word's document-frequency SHARE
    in both halves, and report the {DRIFT_TOP} biggest movers by the
    add-one-smoothed log₂ share ratio (floored at {DRIFT_MIN_DF}
    total df so hapax noise can't top the list). A template change,
    language shift, or topic turn in a source shows up as words with
    |log-ratio| >> 0 — the lexical complement to profile_drift_psi
    (numeric) and emb_drift_snapshots (embedding space).

    Scale shape: one token explode into a combinable per-(word, half)
    distinct-doc count (tf rows are unique per doc/word after the
    inner distinct, so the count is plain), a one-row cohort-size
    cross, and a TakeOrderedAndProject top-k on the ROUNDED |ratio|
    with word tie-break — deterministic cut, no windows."""
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(
        (((F.max("doc_id") + 1) / 2).cast("long")).alias("mid")
    )
    halves = docs.crossJoin(F.broadcast(mid)).select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") < F.col("mid"), 0).otherwise(1).alias("half"),
    )
    sizes = halves.agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_b"),
    )
    words = halves.select(
        "doc_id", "half", F.explode(F.split("text", " ")).alias("word")
    ).distinct()  # one row per (doc, word): df is then a plain count
    df = words.groupBy("word").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("df_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("df_b"),
    )
    df = df.where((F.col("df_a") + F.col("df_b")) >= DRIFT_MIN_DF)
    lr = F.log2(
        ((F.col("df_b") + 1.0) / (F.col("n_b") + 1.0))
        / ((F.col("df_a") + 1.0) / (F.col("n_a") + 1.0))
    )
    scored = df.crossJoin(F.broadcast(sizes)).select(
        "word",
        F.col("df_a").cast("long").alias("df_a"),
        F.col("df_b").cast("long").alias("df_b"),
        lr.alias("_lr"),
    )
    return (
        scored.select(
            "word",
            "df_a",
            "df_b",
            F.round("_lr", 4).alias("log2_ratio"),
            F.round(F.abs("_lr"), 6).alias("_key"),
        )
        .orderBy(F.col("_key").desc(), "word")
        .limit(DRIFT_TOP)
        .drop("_key")
    )
