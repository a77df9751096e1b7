"""Sparse TF-IDF pairwise document similarity via an inverted index
(SURVEY.md §2B similarity north star, round-5 post-window).

The dense arm (plans/similarity.py) compares embedding vectors; this
is the complementary SPARSE technique — term-at-a-time pairwise cosine
over tf-idf weights, the classic inverted-index document-similarity
join (Bayardo et al. WWW'07 "Scaling Up All Pairs Similarity Search",
public) that search engines and semantic-dedup pipelines run when no
embeddings exist.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

TOP_PAIRS = 20
DF_CAP_FRAC = 1.0  # drop terms with df > frac*N (1.0 = keep all; the
# synthetic 30-word vocabulary appears in nearly every doc, so any
# real cap would empty the index — production corpora use ~0.1-0.5)
POSTING_CAP = 64  # champion-list bound: keep only the top-CAP
# postings per (source, word) by normalized weight before the pair
# join. THIS is the active scale valve on this corpus (the df cap is
# a no-op on a 31-word vocabulary): it bounds the self-join to
# O(vocab * sources * CAP^2) pair rows REGARDLESS of corpus size —
# impact-ordered index pruning, standard in all-pairs similarity
# (Bayardo WWW'07 prefix filtering is the exact-threshold variant;
# champion lists are the top-k variant). The rank key is the weight
# ROUNDED to 9 dp with doc_id tie-break so the boundary cut is
# engine-deterministic; the oracle mirrors the identical truncation.


def _tfidf_postings(
    docs: DataFrame, *, with_source: bool, df_cap_frac: float = 1.0
) -> DataFrame:
    """Shared tf-idf posting builder: tokenize -> tf per (doc, term) ->
    corpus df -> weight tf * ln(N/df), with the optional df cap. One
    implementation so the idf formula / cap / double-promotion
    discipline cannot drift between the pair-similarity and keyword
    plans. Returns (doc_id, [source,] word, w) with w UNROUNDED —
    each caller rounds at its own output boundary."""
    keys = ["doc_id", "source"] if with_source else ["doc_id"]
    tok = docs.select(*keys, F.explode(F.split("text", " ")).alias("word"))
    tf = tok.groupBy(*keys, "word").agg(F.count(F.lit(1)).alias("tf"))
    # tf rows are unique per (doc, word) by construction, so document
    # frequency is a plain COUNT — COUNT(DISTINCT) would plan an
    # unnecessary expand/dedup phase over the posting table
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # df is vocabulary-sized — broadcast it so the posting table is
    # not shuffled by word for this join (guide §3.1)
    return (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n))
        .where(F.col("df") <= df_cap_frac * F.col("n_docs"))
        .select(
            *keys,
            "word",
            (
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w"),
        )
    )


@register(
    "sim_tfidf_pairs",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
    FROM documents
),
tf AS (
    SELECT doc_id, source, word, COUNT(*) AS tf
    FROM tok GROUP BY doc_id, source, word
),
df AS (
    SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
    SELECT doc_id, source, word,
           tf * ln(CAST(n_docs AS DOUBLE) / df) AS w
    FROM tf JOIN df USING (word), n
    WHERE df <= {DF_CAP_FRAC} * n_docs
),
norms AS (
    SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
),
wn_all AS (
    SELECT doc_id, source, word, w / nrm AS wn
    FROM w JOIN norms USING (doc_id)
),
wn AS (
    SELECT doc_id, source, word, wn
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source, word
            ORDER BY ROUND(wn, 9) DESC, doc_id) AS prnk
        FROM wn_all
    )
    WHERE prnk <= {POSTING_CAP}
)
SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(SUM(a.wn * b.wn), 6) AS cos_sim
FROM wn a JOIN wn b
  ON a.word = b.word AND a.source = b.source AND a.doc_id < b.doc_id
GROUP BY a.source, a.doc_id, b.doc_id
ORDER BY cos_sim DESC, doc_a, doc_b
LIMIT {TOP_PAIRS}
""",
    tags=("similarity", "tfidf", "sparse"),
)
def sim_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_PAIRS} most similar document pairs by tf-idf cosine,
    computed term-at-a-time over an inverted index: tf per (doc,
    term), idf from corpus document frequency, pair dot products from
    the SELF-JOIN OF POSTINGS ON TERM (only pairs sharing a term are
    ever scored — the sparsity win), normalized by per-doc norms.

    Scale shape: every stage is a combinable aggregation or an
    equi-join; nothing all-pairs. Three published safety valves: (1)
    the ACTIVE champion-list cap truncates every (source, word)
    posting list to its top-{POSTING_CAP} weights before the pair
    join, so pair volume is O(vocab * sources * CAP^2) independent of
    corpus size — the top-k analogue of Bayardo prefix filtering,
    mirrored exactly in the oracle; (2) the df cap drops stop-terms
    whose posting lists would dominate (a no-op on this 31-word
    synthetic vocabulary — every term is near-ubiquitous, so any real
    frac would empty the index — parameterized for real corpora);
    (3) same-source blocking bounds each posting self-join — the
    standard partition-then-pair discipline shared with
    dedup_ngram_jaccard.
    The one-row corpus count broadcasts (whitelisted scalar cross).
    TakeOrderedAndProject finishes the global top-k; ordering is on
    the ROUNDED score with doc-id tie-breaks so the cut is
    engine-deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    w = _tfidf_postings(docs, with_source=True, df_cap_frac=DF_CAP_FRAC)
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    # normalize BEFORE the pair join: unit-weighted postings make the
    # pair dot product the cosine directly, so the two norm joins move
    # off the (large) pair set onto the (small) posting set
    wn = w.join(norms, "doc_id").select(
        "doc_id", "source", "word", (F.col("w") / F.col("nrm")).alias("wn")
    )
    # champion-list truncation: only the top-POSTING_CAP postings per
    # (source, word) enter the pair join, bounding it to
    # O(vocab * sources * CAP^2) regardless of corpus size. Rank on
    # the ROUNDED weight (doc_id tie-break) so the cut is
    # engine-deterministic; the per-cell window is bounded by the
    # posting list, never the corpus.
    prnk = F.row_number().over(
        Window.partitionBy("source", "word").orderBy(
            F.desc(F.round("wn", 9)), "doc_id"
        )
    )
    # Round-13 (guide §2.4): the self-join below would otherwise
    # duplicate the ENTIRE upstream (scan -> tokenize -> tf -> df ->
    # norms -> window) once per side. The capped index is tiny — at
    # most vocab x sources x POSTING_CAP rows, independent of corpus
    # size — so localCheckpoint it once and broadcast the build side.
    # Deterministic aggregates only; results unchanged.
    wn = (
        wn.withColumn("prnk", prnk)
        .where(F.col("prnk") <= POSTING_CAP)
        .drop("prnk")
        .localCheckpoint()
    )
    a, b = wn.alias("a"), F.broadcast(wn.alias("b"))
    return (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
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
        .limit(TOP_PAIRS)
    )


KEYWORDS_PER_DOC = 3


@register(
    "text_keywords_tfidf",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
    SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
),
df AS (
    SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
    SELECT doc_id, word,
           ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS weight
    FROM tf JOIN df USING (word), n
)
SELECT doc_id, CAST(rnk AS INT) AS rnk, word, weight
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY weight DESC, word) AS rnk
    FROM w
)
WHERE rnk <= {KEYWORDS_PER_DOC}
ORDER BY doc_id, rnk
""",
    tags=("text", "tfidf", "keywords"),
)
def text_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: the top-{KEYWORDS_PER_DOC} highest tf-idf
    terms per document (ties toward the lexically smaller term) — the
    classic statistical auto-tagging step (the degenerate-but-exact
    core of RAKE/YAKE-style extractors) used for corpus browsing and
    topic routing.

    Scale shape: tf and df are stacked combinable aggregations; the
    rank window is partitioned PER DOCUMENT over that document's own
    distinct terms (bounded by per-doc vocabulary, never corpus size).
    The one-row corpus count broadcasts. Weights are rounded BEFORE
    ranking so the rank-boundary cut is engine-deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    w = _tfidf_postings(docs, with_source=False).select(
        "doc_id", "word", F.round("w", 6).alias("weight")
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("weight"), "word")
    )
    return (
        w.withColumn("rnk", rnk)
        .where(F.col("rnk") <= KEYWORDS_PER_DOC)
        .select("doc_id", "rnk", "word", "weight")
        .orderBy("doc_id", "rnk")
    )
