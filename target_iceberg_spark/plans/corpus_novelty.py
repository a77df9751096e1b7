"""Corpus-growth lexical diagnostics (SURVEY.md §2B text tier, round-6
post-window): n-gram novelty saturation and a Zipf-skewed stress
corpus.

text_ngram_novelty answers the curation question "is new data still
adding new content?": as a corpus grows, the fraction of never-seen-
before n-grams per document decays, and the decay curve by ingest
position is the standard diminishing-returns signal for data
acquisition. text_zipf_skewed derives a DETERMINISTIC Zipf(1) corpus
from md5 draws and fits the rank-frequency slope — giving the lexical
tier a realistically skewed frequency distribution (the driver's
word-salad vocabulary is near-uniform, which no real corpus is) while
staying bit-reproducible across engines.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.hashing import hex_int_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

NOV_N = 8  # novelty n-gram width (matches text_dup_ngram_fraction)
NOV_BUCKETS = 10  # ingest-order deciles

ZIPF_V = 1000  # synthetic vocabulary size
ZIPF_TOP = 100  # ranks used for the slope fit


@register(
    "text_ngram_novelty",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT DISTINCT doc_id,
           md5(array_to_string(t[i : i + {NOV_N} - 1], ' ')) AS g
    FROM toks,
         LATERAL (SELECT unnest(range(1, len(t) - {NOV_N} + 2)) AS i)
    WHERE len(t) >= {NOV_N}
),
firsts AS (
    SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
),
per_doc AS (
    SELECT gr.doc_id,
           CAST(COUNT(*) FILTER (WHERE f.first_doc = gr.doc_id) AS DOUBLE)
               / COUNT(*) AS novelty
    FROM grams gr JOIN firsts f ON gr.g = f.g
    GROUP BY gr.doc_id
),
mx AS (SELECT MAX(doc_id) AS mx FROM documents)
SELECT CAST((p.doc_id * {NOV_BUCKETS}) // (mx.mx + 1) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(novelty), 4) AS avg_novelty,
       ROUND(MIN(novelty), 4) AS min_novelty
FROM per_doc p, mx
GROUP BY 1
ORDER BY bucket
""",
    tags=("text", "novelty", "curation"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty saturation by ingest order: for every document,
    the fraction of its distinct {NOV_N}-grams whose FIRST corpus
    occurrence (minimum doc_id, the ingest-order proxy) is this
    document, averaged over {NOV_BUCKETS} ingest-position deciles —
    the diminishing-returns curve a data-acquisition pipeline reads
    to decide whether the next crawl batch still adds content, and
    the aggregate complement to dedup-style filters (which drop
    documents; this MEASURES the decay).

    Scale shape: the text_dup_ngram_fraction discipline — grams leave
    each row as 16-byte md5 digests, first-occurrence is ONE
    combinable MIN per digest, documents rejoin their grams through
    ONE digest equi-join, and the decile report is a grouped
    aggregation over the per-doc frame (the one-row max-id aggregate
    broadcasts). At 100 TB the firsts table persists as the corpus
    first-seen index and incremental batches join against it."""
    # fanout A/B'd round 13 and REJECTED (off 2.30 s -> on 2.61 s,
    # 1.14x): the distinct's shuffle already spreads everything past
    # the shingle stage, and both consumers pay the extra exchange.
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .where(F.size("t") >= NOV_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - NOV_N + 1),
                    lambda i: F.md5(
                        F.array_join(F.slice("t", i, NOV_N), " ")
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            (
                F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("novelty")
        )
    )
    mx = docs.agg(F.max("doc_id").alias("mx"))
    return (
        per_doc.crossJoin(F.broadcast(mx))
        .groupBy(
            ((F.col("doc_id") * NOV_BUCKETS) / (F.col("mx") + 1))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("novelty"), 4).alias("avg_novelty"),
            F.round(F.min("novelty"), 4).alias("min_novelty"),
        )
        .orderBy("bucket")
    )


@register(
    "text_zipf_skewed",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, i
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
),
draws AS (
    SELECT CAST(floor(exp(
               (({hex_int_sql(
                   "md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))"
               )} + 0.5) / 4294967296.0) * ln({ZIPF_V})
           )) AS INT) AS rank_w
    FROM toks
),
freq AS (
    SELECT rank_w, CAST(COUNT(*) AS DOUBLE) AS cnt
    FROM draws GROUP BY rank_w
),
ranked AS (
    SELECT cnt, row_number() OVER (ORDER BY cnt DESC, rank_w) AS rnk
    FROM freq
),
fit AS (
    SELECT ln(rnk) AS x, ln(cnt) AS y FROM ranked WHERE rnk <= {ZIPF_TOP}
)
SELECT CAST((SELECT COUNT(*) FROM draws) AS BIGINT) AS n_tokens,
       CAST((SELECT COUNT(*) FROM freq) AS BIGINT) AS vocab,
       ROUND(regr_slope(y, x), 3) AS zipf_slope,
       ROUND(regr_r2(y, x), 3) AS fit_r2
FROM fit
""",
    tags=("text", "zipf", "skew"),
)
def text_zipf_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over a DERIVED skewed corpus: each
    token position draws a vocabulary rank from Zipf(1) via the
    inverse-CDF floor(exp(u·ln V)) on an md5-seeded uniform, so both
    engines materialize the IDENTICAL heavy-tailed corpus (top word ≈
    {ZIPF_V}/ln({ZIPF_V})× the median's frequency) and the fitted
    log-log slope lands near -1. The driver's word-salad corpus is
    near-uniform; this query gives the lexical tier a realistic skew
    AND stress-tests the aggregation path under heavy hitters —
    deliberately: the hottest rank owns ~14% of all tokens.

    Scale shape: the draw is a per-row md5+exp expression (codegen,
    no UDF); the frequency table is ONE combinable count whose
    map-side partials absorb the skew before the exchange (a hot
    word never concentrates rows on one reducer beyond its single
    combined partial per map task); the rank window runs over the
    ≤{ZIPF_V}-row frequency table and the OLS slope is a closed-form
    aggregate over {ZIPF_TOP} rows. Rank ties break on rank_w so the
    fit window is engine-deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i0", "w")
    ).select("doc_id", (F.col("i0") + 1).alias("i"))
    u = F.expr(
        "(cast(conv(substring(md5(concat(cast(doc_id as string), ':',"
        "                            cast(i as string))), 1, 8), 16, 10)"
        "      as double) + 0.5) / 4294967296.0"
    )
    draws = toks.select(
        F.floor(F.exp(u * F.lit(math.log(ZIPF_V))))
        .cast("int")
        .alias("rank_w")
    )
    # localCheckpoint (round 13): freq (≤ ZIPF_V rows) feeds THREE
    # consumers — the rank/fit chain, the vocab count, and (after the
    # rewrite below) the token total — and each re-ran the corpus
    # tokenize + md5 + exp draw. One corpus pass now feeds all three.
    freq = (
        draws.groupBy("rank_w")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .localCheckpoint()
    )
    ranked = freq.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), "rank_w"))
        .alias("rnk"),
    )
    fit = ranked.where(F.col("rnk") <= ZIPF_TOP).select(
        F.log("rnk").alias("x"), F.log("cnt").alias("y")
    )
    # n_tokens = SUM of the per-rank counts — the identical integer to
    # counting the draws (each cnt is an exact-integer double and the
    # total stays far below 2^53, so the double sum is exact) — read
    # from the checkpointed freq instead of a second corpus pass.
    # coalesce(..., 0): SUM over an empty table is NULL where the
    # original COUNT(*) (and the DuckDB oracle) returns 0 — the
    # coalesce preserves COUNT semantics on an empty corpus (ADVICE
    # r13; non-empty results are unchanged).
    n_tokens = freq.agg(
        F.coalesce(F.sum("cnt"), F.lit(0.0)).cast("bigint").alias("n_tokens")
    )
    vocab = freq.agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    return (
        fit.agg(
            F.round(F.expr("regr_slope(y, x)"), 3).alias("zipf_slope"),
            F.round(F.expr("regr_r2(y, x)"), 3).alias("fit_r2"),
        )
        .crossJoin(F.broadcast(n_tokens))
        .crossJoin(F.broadcast(vocab))
        .select("n_tokens", "vocab", "zipf_slope", "fit_r2")
    )
