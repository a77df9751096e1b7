"""Zipf-corpus twins of the lexical retrieval tier (SURVEY.md §2B
text/similarity, round 7 — the round-6 verdict's polish item).

The driver's word-salad corpus is near-uniform (~30-word vocabulary,
every term in nearly every doc), which leaves the lexical tier's
df-based safety valves untested: text_bm25's idf is almost constant
and sim_tfidf_pairs' df cap is a documented no-op. text_zipf_skewed
(plans/corpus_novelty.py) already derives a DETERMINISTIC Zipf(1)
token stream from md5 draws — identical in both engines; this module
generalizes that derivation into a shared token builder and points
the two retrieval shapes at it:

  * text_bm25_zipf      — BM25 where idf actually spans its range
                          (head word in ~every doc, tail words rare).
  * sim_tfidf_pairs_zipf — the champion-capped all-pairs similarity
                          with the DF CAP ACTIVE: under Zipf, head
                          terms exceed the 50% document-frequency
                          ceiling and are dropped, exercising the
                          production stop-term valve the uniform
                          corpus never could.

Both results are driver-hash-checked against oracles that derive the
IDENTICAL corpus, so skew behavior (not just plumbing) is verified.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.hashing import hex_int_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.text_extra import BM25_B, BM25_K1
from target_iceberg_spark.sources.tables import load_table

ZIPF_V = 1000  # vocabulary size (matches text_zipf_skewed)
BM25_ZIPF_TERMS = (1, 10, 100)  # head / mid / tail query ranks
BM25_ZIPF_TOP = 15
ZPAIR_TOP = 20
ZPAIR_DF_FRAC = 0.5  # ACTIVE under Zipf: head ranks exceed this
ZPAIR_POSTING_CAP = 64  # same champion-list bound as sim_tfidf_pairs


def zipf_tokens(docs: DataFrame, *, with_source: bool) -> DataFrame:
    """(doc_id[, source], w): one Zipf(1)-distributed integer word per
    original token position, via the inverse-CDF floor(exp(u·ln V)) on
    an md5-seeded uniform — bit-identical to the oracle's derivation
    (same idiom as text_zipf_skewed, factored out for reuse)."""
    keys = ["doc_id", "source"] if with_source else ["doc_id"]
    toks = docs.select(
        *keys, F.posexplode(F.split("text", " ")).alias("i0", "_t")
    ).select(*keys, (F.col("i0") + 1).alias("i"))
    u = F.expr(
        "(cast(conv(substring(md5(concat(cast(doc_id as string), ':',"
        "                            cast(i as string))), 1, 8), 16, 10)"
        "      as double) + 0.5) / 4294967296.0"
    )
    return toks.select(
        *keys,
        F.floor(F.exp(u * F.lit(math.log(ZIPF_V)))).cast("int").alias("w"),
    )


def _ztok_sql(cols: str) -> str:
    """DuckDB CTE body mirroring :func:`zipf_tokens`."""
    h = hex_int_sql(
        "md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))"
    )
    u = f"(({h} + 0.5) / 4294967296.0)"
    return f"""
    SELECT {cols},
           CAST(floor(exp({u} * ln({ZIPF_V}))) AS INT) AS w
    FROM (SELECT doc_id, source, string_split(text, ' ') AS t
          FROM documents),
         LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
"""


@register(
    "text_bm25_zipf",
    oracle=f"""
WITH ztok AS ({_ztok_sql("doc_id")}),
dl AS (
    SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dlen FROM ztok GROUP BY doc_id
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dlen) AS avgdl FROM dl
),
tf AS (
    SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf
    FROM ztok WHERE w IN {BM25_ZIPF_TERMS}
    GROUP BY doc_id, w
),
dfq AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY w),
contrib AS (
    SELECT tf.doc_id,
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
           * tf.tf * ({BM25_K1} + 1)
           / (tf.tf + {BM25_K1}
              * (1 - {BM25_B} + {BM25_B} * dl.dlen / s.avgdl)) AS c
    FROM tf JOIN dfq d USING (w) JOIN dl ON dl.doc_id = tf.doc_id, stats s
)
SELECT doc_id, ROUND(SUM(c), 6) AS bm25
FROM contrib
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_ZIPF_TOP}
""",
    tags=("text", "retrieval", "bm25", "zipf"),
)
def text_bm25_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_bm25 on the derived Zipf corpus for the query ranks
    {BM25_ZIPF_TERMS}: rank 1 appears in essentially every document
    (idf ≈ 0 — BM25 correctly near-ignores it), rank 100 is rare and
    dominates the score — the idf dynamic range the uniform corpus
    cannot produce, now driver-hash-verified. Same plan shape as
    text_bm25: the token stream filters to query terms BEFORE any
    aggregation, df is a |query|-row broadcast, N/avgdl a one-row
    broadcast cross (whitelisted scalar class), and the finisher is
    TakeOrderedAndProject on the rounded score with doc_id
    tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    toks = zipf_tokens(docs, with_source=False)
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dlen")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dlen").alias("avgdl"),
    )
    tf = (
        toks.where(F.col("w").isin(*BM25_ZIPF_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
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
        .limit(BM25_ZIPF_TOP)
    )


@register(
    "sim_tfidf_pairs_zipf",
    oracle=f"""
WITH ztok AS ({_ztok_sql("doc_id, source")}),
tf AS (
    SELECT doc_id, source, w, COUNT(*) AS tf
    FROM ztok GROUP BY doc_id, source, w
),
dfr AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
wt AS (
    SELECT doc_id, source, w,
           tf * ln(CAST(n_docs AS DOUBLE) / df) AS wgt
    FROM tf JOIN dfr USING (w), n
    WHERE df <= {ZPAIR_DF_FRAC} * n_docs
),
norms AS (
    SELECT doc_id, sqrt(SUM(wgt * wgt)) AS nrm FROM wt GROUP BY doc_id
),
wn_all AS (
    SELECT doc_id, source, w, wgt / nrm AS wn
    FROM wt JOIN norms USING (doc_id)
),
wn AS (
    SELECT doc_id, source, w, wn
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source, w
            ORDER BY ROUND(wn, 9) DESC, doc_id) AS prnk
        FROM wn_all
    )
    WHERE prnk <= {ZPAIR_POSTING_CAP}
)
SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(SUM(a.wn * b.wn), 6) AS cos_sim
FROM wn a JOIN wn b
  ON a.w = b.w AND a.source = b.source AND a.doc_id < b.doc_id
GROUP BY a.source, a.doc_id, b.doc_id
ORDER BY cos_sim DESC, doc_a, doc_b
LIMIT {ZPAIR_TOP}
""",
    tags=("similarity", "tfidf", "sparse", "zipf"),
)
def sim_tfidf_pairs_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_tfidf_pairs on the derived Zipf corpus with the document-
    frequency stop-term cap ACTIVE: terms appearing in more than
    50% of documents (the Zipf head — rank 1 alone is
    ~14% of tokens and reaches nearly every doc) are dropped before
    the posting self-join, and the champion-list cap
    ({ZPAIR_POSTING_CAP} per (source, term)) bounds what remains.
    This is the configuration a production corpus runs — both valves
    live — and the driver hash now checks the VALVE SEMANTICS under
    skew, not just the uniform-corpus plumbing.

    Scale shape identical to sim_tfidf_pairs: combinable tf/df
    aggregations, one-row corpus-count broadcast (whitelisted scalar
    cross), per-(source, term) rank window for the cap (partitioned),
    posting equi-self-join bounded by CAP² per term, global top-k via
    TakeOrderedAndProject on the rounded score."""
    # fanout: with tf checkpointed below there is exactly ONE
    # md5-per-token derivation pass left — spread it (guide §2.5); the
    # pre-checkpoint A/B that rejected fanout here (1.17x) was paying
    # the exchange once per duplicated subtree.
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    tok = zipf_tokens(docs, with_source=True)
    # Round-13 (guide §1.2 step 1, §2.4 — the KN-family pattern): tf
    # feeds the df rollup AND the weight join, wt feeds norms AND the
    # normalize join, and the capped index self-joins — without a
    # lineage cut the md5-per-token Zipf derivation re-executes per
    # consumer. Checkpoint tf once (the single unavoidable corpus
    # pass), checkpoint the champion-capped index (vocab x sources x
    # CAP rows), broadcast the vocabulary-sized df table and the tiny
    # index build side. The Zipf draw is md5-deterministic per (doc_id,
    # position), so materialization cannot change values.
    tf = (
        tok.groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dfr = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    wt = (
        tf.join(F.broadcast(dfr), "w")
        .crossJoin(F.broadcast(n))
        .where(F.col("df") <= ZPAIR_DF_FRAC * F.col("n_docs"))
        .select(
            "doc_id",
            "source",
            "w",
            (
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("wgt"),
        )
    )
    norms = wt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wgt") * F.col("wgt"))).alias("nrm")
    )
    wn_all = wt.join(norms, "doc_id").select(
        "doc_id", "source", "w", (F.col("wgt") / F.col("nrm")).alias("wn")
    )
    cap_w = Window.partitionBy("source", "w").orderBy(
        F.round("wn", 9).desc(), "doc_id"
    )
    wn = (
        wn_all.withColumn("prnk", F.row_number().over(cap_w))
        .where(F.col("prnk") <= ZPAIR_POSTING_CAP)
        .drop("prnk")
        .localCheckpoint()
    )
    a, b = wn.alias("a"), F.broadcast(wn.alias("b"))
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.source").alias("source"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.round(F.sum(F.col("a.wn") * F.col("b.wn")), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "doc_a", "doc_b")
        .limit(ZPAIR_TOP)
    )
