"""Round-5 corpus/statistics tier: Zipf-law fit over the token
distribution, embedding-norm health stats, RFM user segmentation with
exact-percentile boundaries, per-partition ntile bands, a grouped
correlation matrix, and URL component extraction (SURVEY.md §2B
north-star extensions; the reference has no query surface at all).

Scale notes: no query here sorts or windows anything unbounded — the
only window runs over a top-k-bounded 100-row input (text_zipf,
whitelisted with that argument in tests/test_plans.py) or inside a
per-partition band (win_ntile); percentile boundaries come from
Spark's combinable exact-percentile aggregate, not a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.quality_curation import _URL_SQL, _URL_SQL_DUCK
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# --------------------------------------------------------------------
# text_zipf — rank-frequency power-law fit
# --------------------------------------------------------------------

ZIPF_TOP_K = 100


@register(
    "text_zipf",
    oracle=f"""
WITH tokens AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
counts AS (
    SELECT w, COUNT(*) AS cnt FROM tokens WHERE len(w) > 0 GROUP BY w
),
top AS (
    SELECT cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rank
    FROM counts
    ORDER BY cnt DESC, w
    LIMIT {ZIPF_TOP_K}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
       ROUND(regr_slope(LN(CAST(cnt AS DOUBLE)),
                        LN(CAST(rank AS DOUBLE))), 4) AS zipf_slope
FROM top
""",
    tags=("text", "stats"),
)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: slope of log(frequency) on log(rank) over the
    top-K vocabulary — the one-number corpus-health check (natural
    text sits near -1; templated/boilerplate corpora flatten, spam
    skews steeper) a pretraining pipeline tracks per ingest batch.

    Scale shape: token counting is the combinable explode+groupBy
    already proven by text_tokens; the rank window runs over the
    TakeOrderedAndProject top-K output — a K-row (=100) bounded input,
    NOT the banned vocabulary-wide window class (that killer is
    exactly what round 3 removed from text_vocab_coverage; here the
    limit comes first, so the single-task window is O(K) by
    construction). The regression itself is one combinable
    regr_slope aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), "w").limit(ZIPF_TOP_K)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("cnt"), "w"))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.round(
            F.regr_slope(
                F.log(F.col("cnt").cast("double")),
                F.log(F.col("rank").cast("double")),
            ),
            4,
        ).alias("zipf_slope"),
    )


# --------------------------------------------------------------------
# emb_norm_stats — embedding-norm health profile
# --------------------------------------------------------------------

_SQNORM_DUCK = (
    "list_sum(list_transform(range(1, len(embedding) + 1), "
    "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
)


@register(
    "emb_norm_stats",
    oracle=f"""
WITH norms AS (
    SELECT label, ROUND(sqrt({_SQNORM_DUCK}), 6) AS norm
    FROM embeddings
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(norm), 4) AS avg_norm,
       MIN(norm) AS min_norm,
       MAX(norm) AS max_norm
FROM norms
GROUP BY label
ORDER BY label
""",
    tags=("embeddings", "profile"),
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm distribution per label — the vector-store intake
    check that catches unnormalized batches, collapsed (near-zero)
    vectors, and fp16 overflow spikes before they poison cosine
    rankings downstream.

    Scale shape: one codegen zip-free fold per row (functions/vectors
    sq_norm — JVM sequential double accumulation, mirrored
    operation-for-operation by the oracle's list_transform fold so the
    6-decimal rounding is bit-stable), then a combinable per-label
    aggregate; no shuffle wider than (label, norm)."""
    from target_iceberg_spark.functions.vectors import sq_norm

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label", F.round(F.sqrt(sq_norm("embedding")), 6).alias("norm")
    )
    return (
        norms.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------
# events_rfm — RFM segmentation with exact-percentile boundaries
# --------------------------------------------------------------------


@register(
    "events_rfm",
    oracle="""
WITH per_user AS (
    SELECT user_id,
           date_diff('day', CAST(MAX(ts) AS DATE),
                     (SELECT CAST(MAX(ts) AS DATE) FROM events))
               AS recency,
           CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary
    FROM events
    GROUP BY user_id
),
bounds AS (
    SELECT quantile_cont(recency, [0.25, 0.5, 0.75]) AS rq,
           quantile_cont(freq, [0.25, 0.5, 0.75]) AS fq,
           quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mq
    FROM per_user
),
seg AS (
    SELECT 1 + CAST(recency > rq[1] AS INT) + CAST(recency > rq[2] AS INT)
             + CAST(recency > rq[3] AS INT) AS r_seg,
           1 + CAST(freq > fq[1] AS INT) + CAST(freq > fq[2] AS INT)
             + CAST(freq > fq[3] AS INT) AS f_seg,
           1 + CAST(monetary > mq[1] AS INT) + CAST(monetary > mq[2] AS INT)
             + CAST(monetary > mq[3] AS INT) AS m_seg
    FROM per_user, bounds
)
SELECT r_seg, f_seg, m_seg, CAST(COUNT(*) AS BIGINT) AS n_users
FROM seg
GROUP BY r_seg, f_seg, m_seg
ORDER BY r_seg, f_seg, m_seg
""",
    tags=("events", "segmentation"),
)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — each user
    quartile-banded on all three axes against EXACT percentile
    boundaries, the classic marketing/engagement cut that is also the
    template for any boundaries-from-the-data-itself segmentation.

    Determinism across engines: monetary is accumulated in integer
    CENTS (floor(x*100+0.5) per event — identical double ops both
    sides, then exact BIGINT sums immune to addition order), and
    quartile boundaries interpolate integers at power-of-two fractions
    (0.25/0.5/0.75), so every boundary double is bit-exact in both
    engines and no user can flip bands on ulp noise.

    Scale shape: per-user rollup is one combinable aggregate;
    boundaries come from Spark's exact-percentile AGGREGATE (partial-
    merged counting buffers — bounded by distinct values, no global
    sort, no window); the 1-row boundary set broadcasts back; the
    final cell rollup is <= 64 groups. The banned shape here would be
    ntile over all users — which is why boundaries-then-compare is
    the form that survives 1000x more users."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(cents).alias("monetary"),
    )
    corpus_max = ev.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    per_user = (
        per_user.crossJoin(F.broadcast(corpus_max))
        .select(
            F.datediff("max_day", "last_day").alias("recency"),
            "freq",
            "monetary",
        )
    )
    bounds = per_user.agg(
        F.expr("percentile(recency, array(0.25D, 0.5D, 0.75D))").alias("rq"),
        F.expr("percentile(freq, array(0.25D, 0.5D, 0.75D))").alias("fq"),
        F.expr("percentile(monetary, array(0.25D, 0.5D, 0.75D))").alias("mq"),
    )

    def band(col: str, q: str) -> F.Column:
        seg = F.lit(1)
        for i in (1, 2, 3):
            seg = seg + (F.col(col) > F.element_at(F.col(q), i)).cast("int")
        return seg

    return (
        per_user.crossJoin(F.broadcast(bounds))
        .select(
            band("recency", "rq").alias("r_seg"),
            band("freq", "fq").alias("f_seg"),
            band("monetary", "mq").alias("m_seg"),
        )
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("r_seg", "f_seg", "m_seg")
    )


# --------------------------------------------------------------------
# win_ntile — per-partition quantile bands
# --------------------------------------------------------------------


@register(
    "win_ntile",
    oracle="""
WITH banded AS (
    SELECT c_nationkey, c_acctbal,
           NTILE(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
)
SELECT c_nationkey, quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       ROUND(SUM(c_acctbal), 2) AS sum_bal
FROM banded
GROUP BY c_nationkey, quartile
ORDER BY c_nationkey, quartile
""",
    tags=("window", "ntile"),
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quantile banding within each partition (customer balance
    quartiles per nation) rolled up to band summaries — the windowed
    bucketing SURVEY §2B's window tier was still missing, and the
    building block for "top quartile per region" cohort logic.

    Scale shape: the window is PARTITIONED on the nation key, so the
    sort is per-partition and parallel (contrast events_rfm, which
    deliberately avoids a whole-table ntile); the rollup on top is a
    combinable aggregate over (nation, quartile). Deterministic
    tiebreak (c_custkey) keeps band edges hash-stable across engines
    since NTILE's row numbering follows the total order exactly."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_nationkey", "c_acctbal", F.ntile(4).over(w).alias("quartile")
        )
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .orderBy("c_nationkey", "quartile")
    )


# --------------------------------------------------------------------
# agg_corr_matrix — grouped pairwise correlations
# --------------------------------------------------------------------


@register(
    "agg_corr_matrix",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
       ROUND(corr(l_quantity, l_discount), 6) AS corr_qty_disc
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregation", "statistics"),
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between fact measures, per group —
    the feature-engineering screen (which measures are redundant,
    which interact) run as ONE combinable aggregate pass instead of
    one job per pair.

    Scale shape: corr's sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²) are all map-side combinable, so the three pairs cost one
    shuffle of 6 doubles × 3 per group — constant state per group
    regardless of row count. Sample correlation in both engines;
    6-decimal rounding collapses the sum-order ulp drift
    (registry.py conventions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.corr("l_extendedprice", "l_discount"), 6).alias(
                "corr_price_disc"
            ),
            F.round(F.corr("l_quantity", "l_discount"), 6).alias(
                "corr_qty_disc"
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------
# fn_url — URL component extraction
# --------------------------------------------------------------------


@register(
    "fn_url",
    oracle=f"""
WITH u AS (
    SELECT event_id, {_URL_SQL_DUCK} AS url FROM events
)
SELECT event_id,
       regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/?#]*([^?#]*)', 1) AS path,
       NULLIF(regexp_extract(url, 'utm_campaign=([^&#]*)', 1), '')
           AS campaign,
       CAST(regexp_extract(url, '/item/([0-9]+)', 1) AS BIGINT) AS item_id
FROM u
ORDER BY event_id
""",
    tags=("functions", "url"),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction with the built-in parse_url family
    (HOST / PATH / QUERY-parameter) plus a regexp id pull — the scalar
    function tier for weblog/crawl processing, kept JVM-side (no
    Python): parse_url and regexp_extract are both codegen
    expressions.

    The oracle mirrors parse_url with anchored regexes; the one
    semantic seam — parse_url yields NULL for a missing query param
    while regexp_extract yields '' — is closed with NULLIF on the
    oracle side, pinning Spark's NULL behavior as the contract."""
    ev = load_table(spark, sf_dir, "events")
    url = F.expr(_URL_SQL)
    return (
        ev.select("event_id", url.alias("url"))
        .select(
            "event_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("utm_campaign")).alias(
                "campaign"
            ),
            F.regexp_extract("url", "/item/([0-9]+)", 1)
            .cast("bigint")
            .alias("item_id"),
        )
        .orderBy("event_id")
    )
