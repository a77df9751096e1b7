"""Tokenizer-training and readability statistics over the documents
corpus (SURVEY.md §2B text tier, round 6).

text_bpe_merges is the inner loop of BPE tokenizer training (Sennrich
et al. ACL'16, public): count adjacent symbol pairs and pick the most
frequent merge candidates — run at corpus scale this IS the statistic
each merge iteration recomputes. text_readability is the Flesch
reading-ease readout (Flesch 1948, public) with the standard
vowel-group syllable heuristic — a per-source prose-complexity signal
next to the Gopher/quality filters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

BPE_TOP = 20


@register(
    "text_bpe_merges",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pairs AS (
    SELECT unnest(list_transform(
               range(1, len(t)), i -> t[i] || ' ' || t[i + 1]
           )) AS pair
    FROM toks WHERE len(t) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT {BPE_TOP}
""",
    tags=("text", "tokenizer", "bpe"),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BPE_TOP} most frequent ADJACENT token pairs across the
    corpus — the merge-candidate statistic at the core of every BPE /
    WordPiece tokenizer-training iteration (count adjacent pairs,
    merge the winner, repeat). Registered as one iteration because
    that is the distributed-scale primitive: the outer loop is a
    driver-side repeat over a shrinking symbol table, but EVERY
    iteration's cost is this corpus-wide pair count.

    Scale shape: pairs are formed per row by zipping the token array
    with itself shifted one position — a plan-local array expression,
    no window, no self-join, no explode-then-lag — then ONE combinable
    count per pair feeds TakeOrderedAndProject for the global top-k.
    Shuffle volume is the distinct-pair count, never corpus token
    count; ordering ties break on the pair text so the cut is
    deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    pairs = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1),"
                    "         slice(t, 2, size(t) - 1),"
                    "         (a, b) -> concat(a, ' ', b))"
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(BPE_TOP)
    )


@register(
    "text_readability",
    oracle="""
WITH per_doc AS (
    SELECT source,
           CAST(len(string_split(text, ' ')) AS DOUBLE) AS words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1)
                AS DOUBLE) AS sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                AS DOUBLE) AS syllables
    FROM documents
),
scored AS (
    SELECT source, words,
           ROUND(206.835 - 1.015 * (words / sentences)
                         - 84.6 * (syllables / words), 4) AS flesch,
           ROUND(syllables / words, 6) AS spw
    FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(words), 2) AS avg_words,
       ROUND(AVG(spw), 4) AS avg_syll_per_word,
       ROUND(AVG(flesch), 2) AS avg_flesch,
       ROUND(MIN(flesch), 2) AS min_flesch,
       ROUND(MAX(flesch), 2) AS max_flesch
FROM scored
GROUP BY source
ORDER BY source
""",
    tags=("text", "readability", "quality"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source: 206.835 - 1.015·(words/sentence)
    - 84.6·(syllables/word), with syllables approximated by vowel-group
    count (the standard dictionary-free heuristic) and sentence count
    floored at 1 for unpunctuated text. Reported as per-source
    mean/min/max — the prose-complexity axis of corpus quality that
    the length/stopword filters (text_quality, text_gopher_rules)
    don't see.

    Scale shape: pure per-row string expressions (split size + two
    regexp extracts — all JVM-side codegen, no UDF) feeding ONE
    combinable per-source aggregation. Per-doc scores are rounded
    before the group means so engine sum-order differences collapse
    at the output boundary."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(F.split("text", " ")).cast("double").alias("words"),
        F.greatest(
            F.size(F.expr(r"regexp_extract_all(text, '[.!?]', 0)")),
            F.lit(1),
        )
        .cast("double")
        .alias("sentences"),
        F.size(
            F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        )
        .cast("double")
        .alias("syllables"),
    )
    scored = per_doc.select(
        "source",
        "words",
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("words") / F.col("sentences"))
            - 84.6 * (F.col("syllables") / F.col("words")),
            4,
        ).alias("flesch"),
        F.round(F.col("syllables") / F.col("words"), 6).alias("spw"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("words"), 2).alias("avg_words"),
            F.round(F.avg("spw"), 4).alias("avg_syll_per_word"),
            F.round(F.avg("flesch"), 2).alias("avg_flesch"),
            F.round(F.min("flesch"), 2).alias("min_flesch"),
            F.round(F.max("flesch"), 2).alias("max_flesch"),
        )
        .orderBy("source")
    )
