"""Tokenizer fertility audit (SURVEY.md §2B curation tier, round 9).

Fertility — subword tokens emitted per whitespace word — is the
standard measure of how well a tokenizer fits a corpus (Ács 2019;
Rust et al. ACL'21 "How good is your tokenizer?" — public): fertility
near 1 means words survive whole, high fertility means the corpus
pays more sequence length (and training cost) per word. Curation
pipelines track it per language/source because a mix shift toward
high-fertility text silently inflates the token budget
(curation_token_budget's denominator).

The tokenizer modeled here is the fixed-piece-budget fallback every
BPE-family tokenizer exhibits on out-of-vocabulary words: a word of
length L costs ceil(L / PIECE_LEN) pieces. That is the worst-case
fan-out bound merges can only improve on, it needs no vocabulary
artifact, and it is exactly computable in both engines — so the audit
is hash-checkable while measuring the real quantity (longer-word
corpora pay more tokens).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PIECE_LEN = 4  # max chars per subword piece (the BPE fallback budget)
FERTILITY_HIGH = 1.5  # docs above this pay a sequence-length penalty


@register(
    "curation_tokenizer_fertility",
    oracle=f"""
WITH d AS (
    SELECT lang,
           list_sum(list_transform(string_split(text, ' '),
                    t -> CAST(ceil(len(t) / {PIECE_LEN}.0) AS BIGINT)))
               AS n_sub,
           len(string_split(text, ' ')) AS n_words
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_sub) AS BIGINT) AS total_subwords,
       ROUND(CAST(SUM(n_sub) AS DOUBLE) / SUM(n_words), 4) AS fertility,
       CAST(COUNT(*) FILTER (
           WHERE CAST(n_sub AS DOUBLE) / n_words > {FERTILITY_HIGH}
       ) AS BIGINT) AS n_high_fertility
FROM d
GROUP BY lang
ORDER BY lang
""",
    tags=("curation", "text", "tokenizer"),
)
def curation_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility: subword pieces (a word of
    length L costs ceil(L/{PIECE_LEN}) — the OOV fallback bound) per
    whitespace word, with corpus totals and the count of documents
    whose fertility exceeds {FERTILITY_HIGH} — the
    sequence-length-tax watchlist.

    Scale shape: the piece count folds per document inside codegen
    (transform + aggregate over the token array — no Python, no
    explode); everything aggregates in ONE combinable groupBy on the
    low-cardinality lang key. Token arrays never shuffle — only two
    integers per document do."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_sub = F.aggregate(
        F.transform(
            toks, lambda t: F.ceil(F.length(t) / PIECE_LEN).cast("bigint")
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    d = docs.select(
        "lang",
        n_sub.alias("n_sub"),
        F.size(toks).alias("n_words"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_sub").cast("bigint").alias("total_subwords"),
            F.round(
                F.sum("n_sub").cast("double") / F.sum("n_words"), 4
            ).alias("fertility"),
            F.sum(
                F.when(
                    F.col("n_sub").cast("double") / F.col("n_words")
                    > FERTILITY_HIGH,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_high_fertility"),
        )
        .orderBy("lang")
    )
