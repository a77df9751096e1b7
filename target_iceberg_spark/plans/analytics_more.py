"""Round-5 analytics additions: per-window top-k, bitmap-based exact
distinct, market-basket co-occurrence, and a fixed-weight logistic
quality filter (SURVEY.md §2B north-star extensions).

Each plan's scale argument is in its docstring; the common thread is
that every ranking window here is PARTITIONED by a bounded key (time
window) and every aggregate keeps a map-side partial phase.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# --------------------------------------------------------------------
# events_window_topk — top event types per time window
# --------------------------------------------------------------------

WINDOW_TOPK = 3


@register(
    "events_window_topk",
    oracle=f"""
WITH per_day AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT day, event_type, n,
           CAST(ROW_NUMBER() OVER (PARTITION BY day
                                   ORDER BY n DESC, event_type) AS INT)
               AS rnk
    FROM per_day
)
SELECT day, event_type, n, rnk
FROM ranked WHERE rnk <= {WINDOW_TOPK}
ORDER BY day, rnk
""",
    tags=("events", "window", "topk"),
)
def events_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k keys per event-time window (the trending-now query):
    tumbling daily windows, count per (window, key), rank WITHIN each
    window, keep the top WINDOW_TOPK.

    Scale shape: the count is a combinable two-key aggregate; the rank
    window is PARTITIONED BY the time window, so its input per task is
    the per-window key-count table (bounded by key cardinality, never
    raw events) and windows process in parallel — the per-window
    mirror of the global TakeOrderedAndProject pattern. The streaming
    twin is stream_tumbling + the same finisher per emitted pane."""
    ev = load_table(spark, sf_dir, "events")
    per_day = (
        ev.groupBy(
            F.window("ts", "1 day").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.to_date("w.start").alias("day"), "event_type", "n")
    )
    rnk = F.row_number().over(
        Window.partitionBy("day").orderBy(F.desc("n"), "event_type")
    )
    return (
        per_day.withColumn("rnk", rnk)
        .where(F.col("rnk") <= WINDOW_TOPK)
        .orderBy("day", "rnk")
    )


# --------------------------------------------------------------------
# agg_bitmap_distinct — exact distinct via mergeable bitmaps
# --------------------------------------------------------------------


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("aggregation", "distinct", "bitmap"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through Spark's bitmap aggregate family
    (bitmap_bucket_number / bitmap_construct_agg / bitmap_count) —
    the third point on the distinct-count design space this engine
    exposes: agg_distinct is the expand-based exact form (state =
    distinct values), agg_approx_distinct/agg_hll_rollup trade error
    for O(1) sketches, and THIS is exact with BOUNDED state: ids fold
    into fixed 32k-bit bucket bitmaps, both aggregation phases are
    map-side combinable (bitmaps OR-merge), and the shuffle carries
    (group, bucket, 4KB bitmap) rows instead of every distinct id.
    At 100 TB with dense integer ids this is the roll-uppable exact
    pattern (what ClickHouse calls groupBitmap); the oracle is plain
    COUNT(DISTINCT) — same answer, different physics."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# agg_copurchase — market-basket pair counts
# --------------------------------------------------------------------

COPURCHASE_TOP = 20


@register(
    "agg_copurchase",
    oracle=f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM pairs
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b
LIMIT {COPURCHASE_TOP}
""",
    tags=("aggregation", "basket"),
)
def agg_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs appearing in
    the same order — the frequent-itemset primitive behind
    also-bought recommendations.

    Scale shape: pair generation is a SELF-EQUI-JOIN on the basket key
    (shuffle-partitioned by l_orderkey — never a cross join), and its
    output is bounded by Σ items-per-basket², which for retail-shaped
    data (tens of items per basket) grows linearly with baskets. The
    pair count is combinable and the final cut is
    TakeOrderedAndProject. A degenerate mega-basket is this query's
    skew risk — the same cap-the-bucket treatment as
    dedup_minhash_capped applies (filter baskets by size first);
    TPC-H baskets are <= 7 items so the cap is not wired here."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(COPURCHASE_TOP)
    )


# --------------------------------------------------------------------
# text_quality_logistic — fixed-weight quality classifier
# --------------------------------------------------------------------

_STOPWORDS = ("a", "the")
# Fixed, published-style weights (a stand-in for a trained fastText/
# logistic quality model's coefficients — the PLUMBING is the point):
_B0, _B_LEN, _B_STOP, _B_REP = -2.0, 0.6, 1.5, -3.0
QUALITY_CUTOFF = 0.5


@register(
    "text_quality_logistic",
    oracle=f"""
WITH feats AS (
    SELECT source,
           len(string_split(text, ' ')) AS n_tok,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN {_STOPWORDS!r})) AS DOUBLE)
               / len(string_split(text, ' ')) AS frac_stop,
           1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS rep_ratio
    FROM documents
),
scored AS (
    SELECT source,
           ROUND(1.0 / (1.0 + EXP(-({_B0} + {_B_LEN} * LN(n_tok)
                                    + {_B_STOP} * frac_stop
                                    + {_B_REP} * rep_ratio))), 6) AS score
    FROM feats
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE score >= {QUALITY_CUTOFF}) AS BIGINT)
           AS n_pass,
       ROUND(AVG(score), 4) AS avg_score
FROM scored
GROUP BY source
ORDER BY source
""",
    tags=("text", "quality", "curation"),
)
def text_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering as pure SQL: per-doc features
    (log length, stopword fraction, repetition ratio) through a
    FIXED-WEIGHT logistic scorer, rolled up to per-source pass rates —
    the shape of a fastText/logistic quality classifier applied at
    corpus scale, with the trained weights as plan literals. Swapping
    in real coefficients changes constants, not the plan.

    Scale shape: all features are codegen expressions over the token
    array (split once per doc, no explode — array_distinct and
    higher-order filter run inside the row); the sigmoid is scalar
    math; the rollup is combinable. Zero shuffles before the final
    per-source aggregate. Transcendentals (exp/ln) rounded at 6 per
    registry convention."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    frac_stop = (
        F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).cast("double")
        / n_tok
    )
    rep_ratio = (
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_tok
    )
    z = (
        F.lit(_B0)
        + _B_LEN * F.log(n_tok.cast("double"))
        + _B_STOP * frac_stop
        + _B_REP * rep_ratio
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (
        docs.select("source", score.alias("score"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("score") >= QUALITY_CUTOFF, 1)).alias(
                "n_pass"
            ),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------
# text_dup_ngram_fraction — corpus-wide duplicated-n-gram filter
# --------------------------------------------------------------------

DUP_NGRAM_N = 8


@register(
    "text_dup_ngram_fraction",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT doc_id, source,
           md5(array_to_string(t[i : i + {DUP_NGRAM_N} - 1], ' ')) AS g
    FROM toks,
         LATERAL (SELECT unnest(range(1, len(t) - {DUP_NGRAM_N} + 2)) AS i)
    WHERE len(t) >= {DUP_NGRAM_N}
),
gram_docs AS (
    SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY g
),
per_doc AS (
    SELECT gr.doc_id, gr.source,
           CAST(COUNT(*) FILTER (WHERE gd.nd > 1) AS DOUBLE) / COUNT(*)
               AS dup_frac
    FROM grams gr JOIN gram_docs gd ON gr.g = gd.g
    GROUP BY gr.doc_id, gr.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(dup_frac), 4) AS avg_dup_frac,
       CAST(COUNT(*) FILTER (WHERE dup_frac > 0.5) AS BIGINT)
           AS n_mostly_dup
FROM per_doc
GROUP BY source
ORDER BY source
""",
    tags=("text", "dedup", "curation"),
)
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RefinedWeb/Gopher duplicated-n-gram filter: for every doc,
    the fraction of its 8-grams that ALSO occur in some other document
    — the corpus-wide cross-doc repetition signal that catches
    boilerplate and templated spam which intra-doc repetition
    (text_repetition) and pairwise near-dup (dedup_minhash) both miss,
    rolled up to per-source averages and a mostly-duplicated count.

    Scale shape: n-grams leave the row as 16-byte md5 digests (never
    the text), the per-gram doc count is a combinable two-phase
    aggregate, and docs rejoin their grams through ONE equi-join on
    the digest — the same compact-key discipline as the LSH family.
    Shuffle volume is O(total grams × 16 bytes); the |Σ|^8 gram space
    never materializes anywhere. At 100 TB the gram_docs side persists
    as the corpus gram-frequency table and incremental batches join
    against it, exactly like dedup_incremental's signature table."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    toks = F.split("text", " ")
    grams = (
        docs.select("doc_id", "source", toks.alias("t"))
        .where(F.size("t") >= DUP_NGRAM_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - DUP_NGRAM_N + 1),
                    lambda i: F.md5(
                        F.array_join(F.slice("t", i, DUP_NGRAM_N), " ")
                    ),
                )
            ).alias("g"),
        )
    )
    gram_docs = grams.groupBy("g").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    per_doc = (
        grams.join(gram_docs, "g")
        .groupBy("doc_id", "source")
        .agg(
            (
                F.count(F.when(F.col("nd") > 1, 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("dup_frac")
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dup_frac"), 4).alias("avg_dup_frac"),
            F.count(F.when(F.col("dup_frac") > 0.5, 1)).alias("n_mostly_dup"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------
# graph_also_bought — 2-hop collaborative filtering
# --------------------------------------------------------------------

ALSO_BOUGHT_PROBE = 42  # probe customer
ALSO_BOUGHT_TOP = 10


@register(
    "graph_also_bought",
    oracle=f"""
WITH bought AS (
    SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
probe AS (
    SELECT partkey FROM bought WHERE custkey = {ALSO_BOUGHT_PROBE}
)
SELECT b.custkey, CAST(COUNT(*) AS BIGINT) AS shared_parts
FROM bought b JOIN probe p ON b.partkey = p.partkey
WHERE b.custkey <> {ALSO_BOUGHT_PROBE}
GROUP BY b.custkey
ORDER BY shared_parts DESC, custkey
LIMIT {ALSO_BOUGHT_TOP}
""",
    tags=("graph", "recommendation"),
)
def graph_also_bought(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhood query over the customer-part bipartite graph
    (customers most similar to a probe customer by shared purchased
    parts) — the collaborative-filtering primitive behind
    customers-like-you, and the graph-traversal shape (expand one hop,
    intersect, rank) that complements graph_pagerank's whole-graph
    iteration with a POINT query.

    Scale shape: the bipartite edge list is one fact equi-join +
    distinct; the probe's part set is a pushed-down filter whose
    output (one customer's parts) BROADCASTS into the second hop, so
    the expansion touches only edges incident to the probe's parts —
    never the full customer×customer similarity matrix; the overlap
    count is combinable and the cut is TakeOrderedAndProject. A
    celebrity part (bought by everyone) is the skew risk; production
    caps part fan-out exactly like dedup_minhash_capped caps buckets."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bought = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey"))
        .distinct()
    )
    probe = bought.where(F.col("custkey") == ALSO_BOUGHT_PROBE).select("partkey")
    return (
        bought.join(F.broadcast(probe), "partkey")
        .where(F.col("custkey") != ALSO_BOUGHT_PROBE)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
        .orderBy(F.desc("shared_parts"), "custkey")
        .limit(ALSO_BOUGHT_TOP)
    )
