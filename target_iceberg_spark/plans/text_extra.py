"""Corpus-statistics extras: PMI collocation mining (SURVEY.md §2B
text-analysis north star).

Pointwise mutual information over corpus bigrams is the classic
collocation detector (Church & Hanks 1990): pmi(x,y) =
ln(p(xy) / (p(x)p(y))) with p(xy) from bigram counts and p(x) from
unigram counts. Training-data pipelines use it to find multi-word
expressions worth preserving as units and to spot templated/boilerplate
phrase patterns.

Everything is count aggregation + one ln(), so the whole query is
whole-stage-codegen expressions with an exact DuckDB mirror.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.hashing import hex_int, hex_int_sql
from target_iceberg_spark.functions.textfns import ngrams_of, tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PMI_MIN_COUNT = 20  # ignore rare bigrams: PMI is unstable at low counts


@register(
    "text_pmi_bigrams",
    oracle=f"""
WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
uni AS (SELECT unnest(toks) AS tok FROM t),
ucnt AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
bg AS (
    SELECT unnest(list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM t
),
bcnt AS (SELECT bigram, COUNT(*) AS n_xy FROM bg GROUP BY bigram),
tot AS (SELECT (SELECT COUNT(*) FROM uni) AS w, (SELECT COUNT(*) FROM bg) AS b)
SELECT bigram,
       CAST(n_xy AS BIGINT) AS n_xy,
       ROUND(LN((n_xy * 1.0 * w * w) / (b * 1.0 * cx.c * cy.c)), 5) + 0.0 AS pmi
FROM bcnt, tot
JOIN ucnt cx ON cx.tok = string_split(bigram, ' ')[1]
JOIN ucnt cy ON cy.tok = string_split(bigram, ' ')[2]
WHERE n_xy >= {PMI_MIN_COUNT}
""",
    tags=("text", "curation"),
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation scores for corpus bigrams seen >= PMI_MIN_COUNT
    times: two map-side-combinable counts (unigrams, bigrams), two
    scalar totals broadcast as a one-row cross join, and two joins of
    the bigram table back to the unigram counts on the split words.
    Both count tables are vocabulary-sized (bounded by Zipf, not by
    corpus rows), so at 100 TB the joins stay small-side-broadcastable
    or cheaply shuffled; corpus text is scanned exactly twice."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(tokens("text").alias("_toks"))
    uni = toked.select(F.explode("_toks").alias("tok"))
    # localCheckpoint both vocabulary-sized count tables: ucnt joins
    # both bigram words AND supplies the unigram total; bcnt_all
    # supplies the rule table AND the bigram total. The scalar totals
    # are exact integer SUMs of the count tables (sum of per-type
    # counts = occurrence count), so the corpus is tokenized exactly
    # twice instead of four times (round-13 plan audit).
    ucnt = (
        uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    )
    bg = toked.select(F.explode(ngrams_of("_toks", 2)).alias("bigram"))
    bcnt_all = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .localCheckpoint()
    )
    bcnt = bcnt_all.where(F.col("n_xy") >= PMI_MIN_COUNT)
    tot = ucnt.agg(F.sum("c").alias("w")).crossJoin(
        bcnt_all.agg(F.sum("n_xy").alias("b"))
    )
    w1 = F.split(F.col("bigram"), " ").getItem(0)
    w2 = F.split(F.col("bigram"), " ").getItem(1)
    return (
        bcnt.crossJoin(F.broadcast(tot))
        .join(ucnt.alias("cx"), w1 == F.col("cx.tok"))
        .join(ucnt.alias("cy"), w2 == F.col("cy.tok"))
        .select(
            "bigram",
            F.col("n_xy").cast("long").alias("n_xy"),
            # + 0.0 canonicalizes IEEE -0.0 (ln of a ratio infinitesimally
            # below 1 rounds to -0.0 in one engine, +0.0 in the other)
            (
                F.round(
                    F.log(
                        (F.col("n_xy") * F.lit(1.0) * F.col("w") * F.col("w"))
                        / (F.col("b") * F.lit(1.0) * F.col("cx.c") * F.col("cy.c"))
                    ),
                    5,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


VOCAB_TOP_K = 50


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
u AS (SELECT unnest(toks) AS tok FROM t),
c AS (SELECT tok, COUNT(*) AS c FROM u GROUP BY tok),
r AS (
    SELECT tok, c,
           ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rk,
           SUM(c * 1.0) OVER (ORDER BY c DESC, tok
                              ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(c * 1.0) OVER () AS w
    FROM c
)
SELECT CAST(rk AS INTEGER) AS rk, tok, CAST(c AS BIGINT) AS c,
       ROUND(cum / w, 6) AS cum_share
FROM r WHERE rk <= {VOCAB_TOP_K}
ORDER BY rk
""",
    tags=("text", "curation"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction diagnostic: the top-K corpus tokens by
    frequency with each rank's CUMULATIVE share of all token
    occurrences — the curve a tokenizer-vocab or stopword-list decision
    reads off (how much of the corpus do the first K types cover?).

    Scale shape: on a 100 TB web corpus the distinct-token table runs
    to billions of rows (typos, URLs, code), so NOTHING vocabulary-wide
    may pass through one task. The top-K is therefore taken with
    ``orderBy().limit(K)`` — Spark plans it as TakeOrderedAndProject, a
    fully parallel per-partition top-K + driver merge of K-row heaps —
    and the corpus token total comes from a separate one-row aggregate
    over per-document token counts (a narrow scan, no explode) that
    broadcasts via crossJoin. Only the already-bounded K-row frame ever
    sees a window, and that window declares a partition key so it never
    plans a vocabulary-wide WindowExec."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    topk = cnt.orderBy(F.desc("c"), "tok").limit(VOCAB_TOP_K)
    total = docs.agg(
        F.sum(F.size(tokens("text"))).cast("double").alias("_w")
    )
    # K rows only. The partition key is the (constant-valued) broadcast
    # total column: a foldable literal would be optimized away and
    # re-trigger the unpartitioned-WindowExec warning, while a column
    # reference survives — one partition of K rows, declared.
    rank_w = Window.partitionBy("_w").orderBy(F.desc("c"), "tok")
    return (
        topk.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(rank_w).alias("rk"),
            "tok",
            F.col("c").cast("long").alias("c"),
            F.round(
                F.sum(F.col("c") * 1.0).over(
                    rank_w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("_w"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("rk")
    )


# Stand-in denylist: with the synthetic corpus carrying no real PII,
# these high-frequency terms play the role of the scrub dictionary
# (emails/phones/secrets in a real pipeline).
SCRUB_DENYLIST = ("customer", "order", "value")


@register(
    "text_scrub",
    oracle=f"""
WITH t AS (
    SELECT source, string_split(lower(text), ' ') AS toks FROM documents
),
s AS (
    SELECT source, len(toks) AS n_toks,
           len(list_filter(toks,
               x -> NOT list_contains({list(SCRUB_DENYLIST)!r}, x))) AS n_kept
    FROM t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks - n_kept) AS BIGINT) AS removed_tokens,
       ROUND(AVG((n_toks - n_kept) * 1.0 / n_toks), 6) AS avg_removed_ratio
FROM s
GROUP BY source
ORDER BY source
""",
    tags=("text", "curation"),
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist scrubbing audit (the PII/boilerplate-removal stage of a
    training-data pipeline): drop every token in a broadcast denylist
    and report, per source, how many documents were touched and what
    fraction of each document was removed.

    The token filter is a codegen array lambda (F.filter + isin over a
    literal list — the denylist ships inside the plan, no join); the
    per-source rollup is one map-side-combinable groupBy. Linear in
    corpus tokens at any scale. A production denylist too large for a
    plan literal becomes a broadcast join against the exploded token
    table instead — same aggregate shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    kept = F.filter(toks, lambda x: ~x.isin(*SCRUB_DENYLIST))
    per_doc = docs.select(
        "source", F.size(toks).alias("n_toks"), F.size(kept).alias("n_kept")
    )
    removed = F.col("n_toks") - F.col("n_kept")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(removed).cast("long").alias("removed_tokens"),
            F.round(F.avg(removed * 1.0 / F.col("n_toks")), 6).alias(
                "avg_removed_ratio"
            ),
        )
        .orderBy("source")
    )


HASH_BUCKETS = 64


@register(
    "text_hashing_vectorizer",
    oracle=f"""
WITH t AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
),
b AS (
    SELECT doc_id,
           CAST({hex_int_sql("md5(tok)")} % {HASH_BUCKETS} AS INT) AS bucket
    FROM t
),
c AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM b GROUP BY doc_id, bucket)
SELECT doc_id, bucket, CAST(tf AS BIGINT) AS tf,
       ROUND(tf / sqrt(SUM(tf * tf) OVER (PARTITION BY doc_id)), 6) AS w
FROM c
ORDER BY doc_id, bucket
""",
    tags=("text", "features"),
)
def text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing-trick vectorizer, MLlib HashingTF's
    shape, Weinberger et al. 2009): each token maps to one of
    HASH_BUCKETS dimensions via an md5-derived bucket — no vocabulary
    table, no fit step, memory O(B) per doc — and the output is the
    sparse (doc, bucket, tf, l2-normalized weight) long form a
    downstream classifier consumes.

    The bucket hash is md5-hex-prefix mod B, identical in both engines
    (Spark conv(hex,16,10) == DuckDB '0x'-cast), so even the hash
    placement is oracle-exact. One explode + combinable groupBy; the
    normalizing window partitions per doc over <= B rows. Linear in
    corpus tokens at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    bucket = (hex_int(F.md5("tok")).cast("bigint") % HASH_BUCKETS).cast("int")
    c = (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    per_doc = Window.partitionBy("doc_id")
    return c.select(
        "doc_id",
        "bucket",
        F.col("tf").cast("long").alias("tf"),
        F.round(
            F.col("tf") / F.sqrt(F.sum(F.col("tf") * F.col("tf")).over(per_doc)), 6
        ).alias("w"),
    ).orderBy("doc_id", "bucket")


BM25_TERMS = ("spark", "fast", "join")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 15


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
),
dl AS (
    SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dlen
    FROM toks GROUP BY doc_id
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dlen) AS avgdl FROM dl
),
tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
    FROM toks WHERE tok IN ({terms})
    GROUP BY doc_id, tok
),
df AS (
    SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok
),
scored AS (
    SELECT tf.doc_id,
           SUM(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                                       + {BM25_B} * dl.dlen / stats.avgdl))
           ) AS score
    FROM tf
    JOIN df USING (tok)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
    GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOP}
"""


@register("text_bm25", oracle=_bm25_oracle(), tags=("text", "retrieval", "bm25"))
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed query — the sparse lexical
    side of hybrid search (the dense side is the sim_* ANN tier), and
    the classic Okapi scoring tf-idf lacks: term-frequency saturation
    (k1) and document-length normalization (b).

    Scale shape: the token explode filters to the QUERY terms before
    any aggregation (the per-(doc,term) tf table is bounded by
    matching docs × query terms, not the corpus token count); df is a
    |query|-row broadcast, N/avgdl a 1-row broadcast; the per-doc
    score is one combinable SUM and the finisher is
    TakeOrderedAndProject. An inverted-index layout (tokens bucketed
    by term) would turn the filter scan into index lookups without
    changing this plan's shape. ln() is transcendental so the final
    score ROUND(6)s away last-ulp libm-vs-JVM skew; ordering is on
    the rounded score with a doc_id tiebreak, so the top-k boundary
    is deterministic in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dlen")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dlen").alias("avgdl"),
    )
    tf = (
        toks.where(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1
                )
                * F.col("tf")
                * (BM25_K1 + 1)
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dlen") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP)
    )


RRF_K = 60


def _hybrid_rrf_oracle() -> str:
    from target_iceberg_spark.functions.vectors import cosine_sql

    cos = f"ROUND({cosine_sql('embedding', 'p')}, 6)"
    return f"""
WITH bm AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
    FROM ({_bm25_oracle().strip()})
),
dense AS (
    SELECT vec_id AS doc_id,
           ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS r
    FROM (
        SELECT vec_id, {cos} AS cos_sim
        FROM embeddings, (SELECT embedding AS p FROM embeddings
                          WHERE vec_id = 0)
        WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id
        LIMIT 10
    )
)
SELECT COALESCE(bm.doc_id, dense.doc_id) AS doc_id,
       ROUND(COALESCE(1.0 / ({RRF_K} + bm.r), 0)
             + COALESCE(1.0 / ({RRF_K} + dense.r), 0), 6) AS rrf
FROM bm FULL OUTER JOIN dense ON bm.doc_id = dense.doc_id
ORDER BY rrf DESC, doc_id
"""


@register(
    "sim_hybrid_rrf",
    oracle=_hybrid_rrf_oracle(),
    tags=("similarity", "retrieval", "hybrid"),
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval capstone: reciprocal-rank fusion of the sparse
    arm (text_bm25's lexical top-k) and the dense arm
    (sim_cosine_topk's embedding top-k), score = Σ 1/(60 + rank) —
    the standard score-scale-free way to merge rankers whose raw
    scores are incomparable, and the shape every hybrid search
    pipeline ends in.

    Scale shape: each arm is its own already-scale-proven plan reduced
    to a k-row (id, rank) list — the rank windows run over k-row
    frames (bounded by the arms' own LIMITs, never corpus-sized), the
    fusion is one full-outer equi-join of two tiny lists, and the
    output is at most |arm1| + |arm2| rows. 1.0/(K + rank) is exact
    IEEE division of small integers in both engines; ROUND(6) on the
    sum is belt-and-braces."""
    from pyspark.sql import Window

    from target_iceberg_spark.plans.relational_extra import sim_cosine_topk

    bm = text_bm25(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .alias("r_bm"),
    )
    dense = sim_cosine_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), "vec_id"))
        .alias("r_dn"),
    )
    return (
        bm.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.lit(1.0) / (RRF_K + F.col("r_bm")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (RRF_K + F.col("r_dn")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
    )
