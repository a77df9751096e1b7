"""Frequency- and cardinality-sketch audits (SURVEY.md §2B profiling
tier, round-6 post-window).

profile_bloom_fpr audits membership pruning; these two audit the other
two sketch workhorses of a 100 TB pipeline: the count-min sketch
(Cormode & Muthukrishnan, J. Algorithms 2005 — frequency estimation in
sublinear space) and the KMV / bottom-k sketch (Bar-Yossef et al.
RANDOM'02; the theta-sketch family) for distinct counting and set
intersection WITHOUT a full distinct shuffle. Both are built as pure
relational algebra over md5-derived hashes, so the sketches and their
error reports are bit-reproducible across engines and hash-checkable
against the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

CMS_D = 4  # sketch depth (independent md5-word hash rows)
CMS_W = 512  # sketch width (counters per row)
CMS_TOP = 20  # report the estimate error for the top-K true keys

# one 32-bit hash word: j-th 8-hex-char slice of md5(key)
_HEX32 = 4294967296.0


def _word_sql(key: str, j: str | int) -> str:
    """DuckDB: j-th 32-bit word of md5(key) as BIGINT."""
    return (
        f"CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)),"
        f" ({j})*8+1, 8)) AS BIGINT)"
    )


def _word_spark(key: str, j: int) -> F.Column:
    """Spark: j-th 32-bit word of md5(key) as BIGINT."""
    return F.expr(
        f"cast(conv(substring(md5(cast({key} as string)),"
        f" {j * 8 + 1}, 8), 16, 10) as bigint)"
    )


@register(
    "profile_cms_error",
    oracle=f"""
WITH keys AS (
    SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY o_custkey
),
ds AS (SELECT unnest(range(0, {CMS_D})) AS d),
pos AS (
    SELECT keys.k, keys.cnt, ds.d,
           {_word_sql("keys.k", "ds.d")} % {CMS_W} AS p
    FROM keys CROSS JOIN ds
),
counters AS (SELECT d, p, SUM(cnt) AS c FROM pos GROUP BY d, p),
est AS (
    SELECT pos.k, pos.cnt, MIN(counters.c) AS est
    FROM pos JOIN counters USING (d, p)
    GROUP BY pos.k, pos.cnt
),
topk AS (SELECT * FROM est ORDER BY cnt DESC, k LIMIT {CMS_TOP})
SELECT k AS o_custkey, cnt AS true_cnt, CAST(est AS BIGINT) AS est_cnt,
       CAST(est - cnt AS BIGINT) AS overest
FROM topk ORDER BY true_cnt DESC, o_custkey
""",
    tags=("profiling", "sketch", "count-min"),
)
def profile_cms_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch accuracy audit over per-customer order counts:
    a {CMS_D}x{CMS_W} CMS is built as relational algebra (each key adds
    its count at one md5-derived position per depth row; ONE combinable
    groupBy folds the counters), every key's estimate is the MIN over
    its {CMS_D} counters, and the top-{CMS_TOP} keys by true frequency
    are reported with their overestimate — the CMS one-sided error
    (est >= true always, pinned in tests). This is the audit that sizes
    d x w before trusting a sketch for heavy-hitter screening at 100 TB,
    where exact per-key counts would shuffle billions of keys and the
    CMS shuffles {CMS_D}x{CMS_W} integers.

    Scale shape: the key-count groupBy is the only key-cardinality
    stage (combinable); positions leave each KEY (not row) as {CMS_D}
    integers; the counter table is at most {CMS_D}x{CMS_W} rows —
    broadcast to the estimate join, so no shuffle scales with the
    sketch; top-K is TakeOrderedAndProject. All arithmetic is integer,
    engine-exact."""
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    pos = keys.select(
        "k",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (_word_spark("k", d) % CMS_W).alias("p"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("dp"),
    ).select("k", "cnt", F.col("dp.d").alias("d"), F.col("dp.p").alias("p"))
    counters = pos.groupBy("d", "p").agg(F.sum("cnt").alias("c"))
    est = (
        pos.join(F.broadcast(counters), ["d", "p"])
        .groupBy("k", "cnt")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.orderBy(F.col("cnt").desc(), "k")
        .limit(CMS_TOP)
        .select(
            F.col("k").alias("o_custkey"),
            F.col("cnt").alias("true_cnt"),
            F.col("est").cast("bigint").alias("est_cnt"),
            (F.col("est") - F.col("cnt")).cast("bigint").alias("overest"),
        )
        .orderBy(F.col("true_cnt").desc(), "o_custkey")
    )


KMV_K = 128  # bottom-k sketch size
KMV_YEAR_A = 1996
KMV_YEAR_B = 1997


@register(
    "profile_kmv_jaccard",
    oracle=f"""
WITH ab AS (
    SELECT o_custkey AS k,
           MAX(CASE WHEN year(o_orderdate) = {KMV_YEAR_A} THEN 1 ELSE 0 END)
               AS in_a,
           MAX(CASE WHEN year(o_orderdate) = {KMV_YEAR_B} THEN 1 ELSE 0 END)
               AS in_b
    FROM orders
    WHERE year(o_orderdate) IN ({KMV_YEAR_A}, {KMV_YEAR_B})
    GROUP BY o_custkey
),
h AS (
    SELECT k, in_a, in_b, {_word_sql("k", 0)} AS hv
    FROM ab
),
kmv AS (SELECT * FROM h ORDER BY hv, k LIMIT {KMV_K}),
sk AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST(MAX(hv) AS BIGINT) AS h_k,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both
    FROM kmv
),
exact AS (
    SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
           CAST(SUM(in_b) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inter,
           CAST(COUNT(*) AS BIGINT) AS n_union
    FROM h
)
SELECT n_a, n_b, n_union, n_inter,
       ROUND(n_inter * 1.0 / n_union, 4) AS jaccard_exact,
       ROUND(n_both * 1.0 / k_used, 4) AS jaccard_est,
       CAST(CASE WHEN k_used < {KMV_K} THEN n_union
                 ELSE CAST(FLOOR(({KMV_K} - 1) * {_HEX32} / h_k) AS BIGINT)
            END AS BIGINT) AS union_est
FROM sk, exact
""",
    tags=("profiling", "sketch", "kmv"),
)
def profile_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) sketch audit for set overlap WITHOUT a full
    distinct: the {KMV_K} smallest md5 hash values over the union of
    two customer cohorts ({KMV_YEAR_A} vs {KMV_YEAR_B} buyers) estimate
    both the union cardinality ((k-1)/h_(k), Bar-Yossef et al.) and the
    Jaccard overlap (fraction of the bottom-k landing in BOTH sets —
    the theta-sketch intersection rule), reported side-by-side with the
    exact values the sketch replaces. At 100 TB the exact n-way overlap
    needs a distinct shuffle per cohort pair; the KMV answer ships as
    {KMV_K} integers per cohort and merges by taking mins — this row is
    the calibration that says how much accuracy that buys.

    Scale shape: one combinable groupBy collapses orders to distinct
    (key, in_a, in_b) rows; the bottom-k is TakeOrderedAndProject (no
    full sort); everything after is a one-row aggregate. When the union
    is smaller than k the sketch IS the set and the CASE returns the
    exact count — the documented small-population degenerate case
    (exercised at sf0.001, the real path from sf0.01 up). FLOOR before
    the BIGINT cast avoids the Spark-truncates / DuckDB-rounds cast
    divergence. Hash ties break on the key, so the bottom-k frontier
    is deterministic in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    ab = (
        orders.where(yr.isin(KMV_YEAR_A, KMV_YEAR_B))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.max(F.when(yr == KMV_YEAR_A, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(yr == KMV_YEAR_B, 1).otherwise(0)).alias("in_b"),
        )
    )
    h = ab.select("k", "in_a", "in_b", _word_spark("k", 0).alias("hv"))
    kmv = h.orderBy("hv", "k").limit(KMV_K)
    both = F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
    sk = kmv.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.max("hv").cast("bigint").alias("h_k"),
        F.sum(both).cast("bigint").alias("n_both"),
    )
    exact = h.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum("in_b").cast("bigint").alias("n_b"),
        F.sum(both).cast("bigint").alias("n_inter"),
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
    )
    return sk.crossJoin(F.broadcast(exact)).select(
        "n_a",
        "n_b",
        "n_union",
        "n_inter",
        F.round(F.col("n_inter") * 1.0 / F.col("n_union"), 4).alias(
            "jaccard_exact"
        ),
        F.round(F.col("n_both") * 1.0 / F.col("k_used"), 4).alias(
            "jaccard_est"
        ),
        F.when(F.col("k_used") < KMV_K, F.col("n_union"))
        .otherwise(
            F.floor(F.lit((KMV_K - 1) * _HEX32) / F.col("h_k")).cast("bigint")
        )
        .cast("bigint")
        .alias("union_est"),
    )
