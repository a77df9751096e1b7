"""Gopher-style document quality rules and lexical diversity
(SURVEY.md §2B text-analysis north star, round-5 post-window).

The Gopher paper (Rae et al. 2021, public) established the standard
rule-based pre-filter for LLM corpora: word-count bounds, mean-word-
length bounds, and a minimum stop-word presence. text_quality /
text_quality_logistic score documents; this tier reproduces the
published RULE set itself, per document, entirely with JVM list
higher-order functions (zero explode, zero shuffle for the signals).

text_lexical_diversity adds the classic type-token ratio / hapax
family — the cheap statistical screen for keyboard-mash and
template-generated text that rule thresholds miss.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf resolves the
# stringified pd.Series annotations against module globals
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "to", "and", "in")
MIN_WORDS, MAX_WORDS = 30, 500
MIN_MWL, MAX_MWL = 3.0, 10.0
MIN_STOP_FRAC = 0.02

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "text_gopher_rules",
    oracle=f"""
WITH sig AS (
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS word_count,
           ROUND(CAST(list_sum(list_transform(words, w -> length(w)))
                      AS DOUBLE) / len(words), 4) AS mean_word_len,
           ROUND(CAST(len(list_filter(words, w -> w IN ({_STOP_SQL})))
                      AS DOUBLE) / len(words), 4) AS stopword_frac
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
)
SELECT doc_id, word_count, mean_word_len, stopword_frac,
       (word_count BETWEEN {MIN_WORDS} AND {MAX_WORDS}
        AND mean_word_len BETWEEN {MIN_MWL} AND {MAX_MWL}
        AND stopword_frac >= {MIN_STOP_FRAC}) AS passes_gopher
FROM sig
ORDER BY doc_id
""",
    tags=("text", "quality", "gopher"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter per document: word count in
    [{MIN_WORDS}, {MAX_WORDS}], mean word length in [3, 10], and
    stop-word fraction >= 2% — the published pre-filter rule set
    (Rae et al. 2021) that LLM corpus pipelines run before any
    model-based scoring.

    Scale shape: every signal is computed INSIDE the row with list
    higher-order functions (size / aggregate / filter) — whole-stage
    codegen, zero explode, zero shuffle, embarrassingly parallel over
    documents. At 100 TB this is a pure map stage whose output
    (4 scalars + a bool per doc) is what downstream curation joins
    against; compare text_lexical_diversity, whose statistics
    genuinely need the explode."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    wc = F.size(words)
    chars = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda acc, x: acc + x
    )
    stops = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    sig = docs.select(
        "doc_id",
        wc.cast("bigint").alias("word_count"),
        F.round(chars.cast("double") / wc, 4).alias("mean_word_len"),
        F.round(stops.cast("double") / wc, 4).alias("stopword_frac"),
    )
    return sig.select(
        "*",
        (
            F.col("word_count").between(MIN_WORDS, MAX_WORDS)
            & F.col("mean_word_len").between(MIN_MWL, MAX_MWL)
            & (F.col("stopword_frac") >= MIN_STOP_FRAC)
        ).alias("passes_gopher"),
    ).orderBy("doc_id")


@register(
    "text_lexical_diversity",
    oracle="""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
per_word AS (
    SELECT doc_id, word, COUNT(*) AS c FROM tok GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 4) AS ttr,
       ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS hapax_ratio
FROM per_word
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("text", "quality", "diversity"),
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document: type-token ratio (distinct
    words / total words) and hapax ratio (share of vocabulary used
    exactly once) — the statistical screens for template spam (TTR
    near 0) and keyboard mash (hapax near 1) that threshold rules
    can't see.

    Scale shape: explode -> two stacked map-side-combinable
    aggregations, both keyed by doc_id (the second reuses the first's
    partitioning — Catalyst plans ONE exchange for the pair). Token
    counts never leave their executor unpre-aggregated; no window, no
    skew beyond document length itself."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    per_word = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("c").alias("n_tokens"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("c"), 4
            ).alias("ttr"),
            F.round(
                F.sum((F.col("c") == 1).cast("int")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("hapax_ratio"),
        )
        .orderBy("doc_id")
    )


COMP_CORR_FLOOR = 0.2  # observed ~0.95 at both test SFs — wide margin
COMP_MIN_CHARS = 64  # ratio ceiling asserted only above this length
# (zlib's ~11-byte fixed overhead dominates shorter docs)


@register(
    "text_compression_ratio",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS n_null_ratio,
       TRUE AS ratios_in_range,
       TRUE AS tracks_lexical_diversity
FROM documents
""",
    tags=("text", "quality", "udf", "audit"),
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: deflate each document's UTF-8
    text at a FIXED zlib level — the cheap, model-free redundancy
    detector (boilerplate and template spam compress far below prose;
    random keyboard mash barely compresses at all) used as a
    pre-filter alongside the rule (text_gopher_rules) and statistical
    (text_lexical_diversity) screens.

    Hash-checkable audit row (round 9; previously rows-only): SQL has
    no DEFLATE, but the signal's CONTRACT does — every ratio lands in
    (0, 1.5], none is null, and across the corpus the ratio tracks
    lexical diversity (corr(ratio, type-token ratio) above
    {COMP_CORR_FLOOR}; observed ~0.95 — more-diverse text compresses
    worse, which IS the quality signal). Those fold to oracle-asserted
    booleans beside the SQL-exact document count; per-doc determinism
    and the repetitive < natural < high-entropy ordering stay pinned
    in tests/test_session4_ops.py with a from-scratch zlib recompute.

    Scale shape: the UDF is an Arrow-batched SCALAR pandas UDF (never
    row-at-a-time Python) — an embarrassingly parallel map, one zlib
    pass per document; the audit fold is one combinable aggregate
    (count/min/max/corr) over (ratio, ttr) pairs."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        _ratio("text").alias("ratio"),
        F.length("text").alias("n_chars"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("ttr"),
    )
    # The <= 1.5 ceiling is asserted only for docs with at least
    # COMP_MIN_CHARS chars: zlib's fixed header/trailer (~11 bytes)
    # legitimately pushes the ratio past 1.5 on very short documents,
    # so an unrestricted max would flip the oracle-pinned boolean on
    # a corpus change that adds short docs even though the UDF is
    # correct (ADVICE r9).
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("ratio").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_ratio"),
        (
            (F.min("ratio") > 0)
            & (
                F.max(
                    F.when(
                        F.col("n_chars") >= COMP_MIN_CHARS,
                        F.col("ratio"),
                    )
                )
                <= 1.5
            )
        ).alias("ratios_in_range"),
        (F.corr("ratio", "ttr") > COMP_CORR_FLOOR).alias(
            "tracks_lexical_diversity"
        ),
    )
