"""Text-analysis plans: token stats, language-ID, quality scoring,
document fingerprinting (SURVEY.md §2B north star).

All four are pure built-in expressions over the documents table —
tokenize/filter/distinct/md5 run inside whole-stage codegen, and each
has an exact DuckDB equivalent so the strict oracle gate applies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.textfns import (
    LANG_MARKERS,
    langid_from_hits,
    marker_hits,
    ngrams_of,
    token_set_fingerprint,
    tokens,
)
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "text_tokens",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
ORDER BY lang
""",
    tags=("text",),
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting aggregated per language."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            F.round(F.avg(n_tok.cast("double")), 4).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


def _langid_oracle() -> str:
    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        hit_cols.append(
            f"len(list_filter(string_split(lower(text), ' '), t -> t IN ({lst}))) AS h_{lang}"
        )
    langs = list(LANG_MARKERS)
    cases = []
    for i, lang in enumerate(langs):
        others = " AND ".join(f"h_{lang} >= h_{o}" for o in langs[i + 1 :])
        cond = f"h_{lang} > 0" + (f" AND {others}" if others else "")
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'unknown' END"
    return f"""
WITH hits AS (
    SELECT doc_id, lang, {", ".join(hit_cols)}
    FROM documents
),
pred AS (SELECT lang, {case_sql} AS pred_lang FROM hits)
SELECT lang, pred_lang, COUNT(*) AS n_docs
FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


@register("text_langid", oracle=_langid_oracle(), tags=("text",))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (marker-lexicon argmax) cross-tabulated
    against the labeled lang column."""
    docs = load_table(spark, sf_dir, "documents")
    # tokens, then marker hits, materialized as columns stage by stage —
    # see langid_from_hits on why inlining bloats codegen.
    toks_df = docs.select("lang", tokens("text").alias("_toks"))
    hits_df = toks_df.select(
        "lang",
        *[
            marker_hits("text", lang, token_array="_toks").alias(f"h_{lang}")
            for lang in LANG_MARKERS
        ],
    )
    pred = langid_from_hits({lang: F.col(f"h_{lang}") for lang in LANG_MARKERS})
    return (
        hits_df.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


@register(
    "text_quality",
    oracle="""
WITH f AS (
    SELECT doc_id, lang, n_chars,
           len(string_split(text, ' ')) AS n_tok,
           len(list_distinct(string_split(lower(text), ' '))) AS n_types
    FROM documents
)
SELECT doc_id, lang,
       CAST(n_tok AS INT) AS n_tokens,
       ROUND(CAST(n_chars AS DOUBLE) / n_tok, 4) AS chars_per_token,
       ROUND(CAST(n_types AS DOUBLE) / n_tok, 4) AS type_token_ratio,
       (n_tok BETWEEN 20 AND 80 AND n_types * 4 >= n_tok) AS quality_ok
FROM f
""",
    tags=("text",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, chars/token,
    type-token ratio, and a boolean gate (integer-ratio thresholds so
    the predicate is engine-exact)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    n_types = F.size(F.array_distinct(tokens("text")))
    return docs.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / n_tok, 4).alias("chars_per_token"),
        F.round(n_types.cast("double") / n_tok, 4).alias("type_token_ratio"),
        (n_tok.between(20, 80) & (n_types * 4 >= n_tok)).alias("quality_ok"),
    )


@register(
    "text_tokens_regex",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f]+')) AS INT)
           AS n_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INT) AS n_alpha,
       CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS INT) AS n_num
FROM documents
""",
    tags=("text",),
)
def text_tokens_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counting: alternation of letter runs,
    digit runs, and punctuation runs (the GPT-2 pre-tokenizer shape,
    minus lookahead; whitespace is an explicit ASCII class because
    Java's \\s includes \\x0B where RE2's does not)."""
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower("text")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(lowered, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f]+"), F.lit(0))).alias("n_tokens"),
        F.size(F.regexp_extract_all(lowered, F.lit(r"[a-z]+"), F.lit(0))).alias("n_alpha"),
        F.size(F.regexp_extract_all(lowered, F.lit(r"[0-9]+"), F.lit(0))).alias("n_num"),
    )


@register(
    "text_fingerprint",
    oracle="""
SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
           AS fingerprint,
       COUNT(*) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM documents
GROUP BY 1
""",
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive token-set fingerprint per document, grouped —
    documents that are word-permutations collapse to one fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(token_set_fingerprint("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@register(
    "text_repetition",
    oracle="""
WITH toks AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
),
tokc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
tstats AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
           MAX(c) AS max_tok
    FROM tokc GROUP BY doc_id
),
w AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
bgs AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
    FROM w
),
bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgs GROUP BY doc_id, bg),
bstats AS (
    SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS max_bg
    FROM bgc GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens, t.distinct_tokens,
       ROUND(CAST(t.distinct_tokens AS DOUBLE) / t.n_tokens, 6) AS distinct_frac,
       ROUND(CAST(t.max_tok AS DOUBLE) / t.n_tokens, 6) AS top_tok_frac,
       ROUND(CAST(b.max_bg AS DOUBLE) / b.n_bigrams, 6) AS top_bigram_frac,
       (CAST(b.max_bg AS DOUBLE) / b.n_bigrams > 0.05) AS repetitive
FROM tstats t JOIN bstats b ON t.doc_id = b.doc_id
""",
    tags=("text", "quality"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition signals per document: type-token
    ratio, top-token fraction, top-bigram fraction, and a repetitive
    flag (top-bigram share above threshold — the Gopher repetition
    filter family). Two map-side-combinable double groupBys (token and
    bigram counts) joined on doc_id; everything stays in whole-stage
    codegen, and work is linear in corpus token count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tstats = (
        toks.groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            F.max("count").alias("max_tok"),
        )
    )
    bgs = docs.select("doc_id", tokens("text").alias("_toks")).select(
        "doc_id", F.explode(ngrams_of("_toks", 2)).alias("bg")
    )
    bstats = (
        bgs.groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("n_bigrams"), F.max("count").alias("max_bg"))
    )
    bg_frac = F.col("max_bg").cast("double") / F.col("n_bigrams")
    return tstats.join(bstats, "doc_id").select(
        "doc_id",
        "n_tokens",
        "distinct_tokens",
        F.round(F.col("distinct_tokens").cast("double") / F.col("n_tokens"), 6).alias(
            "distinct_frac"
        ),
        F.round(F.col("max_tok").cast("double") / F.col("n_tokens"), 6).alias(
            "top_tok_frac"
        ),
        F.round(bg_frac, 6).alias("top_bigram_frac"),
        (bg_frac > 0.05).alias("repetitive"),
    )


NGRAM_TOP_K = 20


@register(
    "text_ngram_topk",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
    FROM w
)
SELECT g AS ngram,
       COUNT(*) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM bg
GROUP BY g
ORDER BY n_occurrences DESC, ngram
LIMIT {NGRAM_TOP_K}
""",
    tags=("text", "boilerplate"),
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-k bigrams with document frequency — the phrase
    mining pass behind boilerplate/blocklist construction (headers,
    license banners, navigation chrome surface here first). One
    combinable groupBy over the exploded bigrams, then
    TakeOrderedAndProject for the top-k — no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select("doc_id", tokens("text").alias("_t")).select(
        "doc_id", F.explode(ngrams_of("_t", 2)).alias("ngram")
    )
    return (
        bg.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(NGRAM_TOP_K)
    )


# Stand-in polarity lexicon over the synthetic vocabulary — the
# operator (broadcast-lexicon scoring) is the point; a real deployment
# swaps in VADER/AFINN-class lists without touching the plan shape.
SENT_POS = ("fast", "big")
SENT_NEG = ("slow", "small")


def _sentiment_oracle() -> str:
    pos_l = ", ".join(f"'{w}'" for w in SENT_POS)
    neg_l = ", ".join(f"'{w}'" for w in SENT_NEG)
    return f"""
WITH sc AS (
    SELECT source,
           len(list_filter(string_split(lower(text), ' '),
               t -> t IN ({pos_l}))) AS pos,
           len(list_filter(string_split(lower(text), ' '),
               t -> t IN ({neg_l}))) AS neg
    FROM documents
)
SELECT source,
       CASE WHEN pos > neg THEN 'positive'
            WHEN neg > pos THEN 'negative'
            ELSE 'neutral' END AS label,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(CASE WHEN pos + neg > 0
                      THEN CAST(pos - neg AS DOUBLE) / (pos + neg)
                      ELSE 0 END), 4) AS avg_polarity
FROM sc
GROUP BY source, label
ORDER BY source, label
"""


@register("text_sentiment", oracle=_sentiment_oracle(), tags=("text", "sentiment"))
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment scoring per source — the Spark shape of
    the EDBT 2016 large-scale Twitter sentiment pipeline (PAPERS.md):
    a tiny polarity lexicon is broadcast as literals into a codegen
    array filter, every document scores in the scan stage, and the
    per-(source, label) rollup is a combinable aggregate. Polarity =
    (pos-neg)/(pos+neg) on integer hit counts (exact same division
    both engines, ROUND(4) over the avg); label by hit-count majority
    — no division in the label path, so the class boundaries are
    integer-exact at any scale. No Python, no join, one shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    pos = F.size(F.filter(toks, lambda t: t.isin(*SENT_POS)))
    neg = F.size(F.filter(toks, lambda t: t.isin(*SENT_NEG)))
    sc = docs.select(
        "source", pos.alias("pos"), neg.alias("neg")
    )
    label = (
        F.when(F.col("pos") > F.col("neg"), F.lit("positive"))
        .when(F.col("neg") > F.col("pos"), F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )
    polarity = F.when(
        (F.col("pos") + F.col("neg")) > 0,
        (F.col("pos") - F.col("neg")).cast("double")
        / (F.col("pos") + F.col("neg")),
    ).otherwise(F.lit(0.0))
    return (
        sc.select("source", label.alias("label"), polarity.alias("pol"))
        .groupBy("source", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("pol"), 4).alias("avg_polarity"),
        )
        .orderBy("source", "label")
    )
