"""Aggregate/function surface, third tier: grouped argmin/argmax,
boolean aggregates, linear regression, bag-semantics set ops, bitwise
scalars, and exact heavy hitters (SURVEY.md §2B aggregation family).

All shapes stay combinable (map-side partial aggregation) or
whole-stage-codegen scalar; the heavy-hitters entry demonstrates the
candidate + exact-recount plan that keeps the shuffle bounded when the
key domain is web-scale (operators/heavy_hitters.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "agg_argmax",
    # max_by/min_by with a struct(ordering, tiebreak) key: the oracle
    # mirrors Spark's lexicographic struct comparison with an
    # explicitly-ordered row_number pick
    oracle="""
WITH ranked AS (
    SELECT c_nationkey, c_name, c_acctbal, c_custkey,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
    FROM customer
)
SELECT mx.c_nationkey,
       mx.c_name AS richest, ROUND(mx.c_acctbal, 2) AS max_bal,
       mn.c_name AS poorest, ROUND(mn.c_acctbal, 2) AS min_bal
FROM (SELECT * FROM ranked WHERE rmax = 1) mx
JOIN (SELECT * FROM ranked WHERE rmin = 1) mn USING (c_nationkey)
ORDER BY c_nationkey
""",
    tags=("aggregate", "argmax"),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped argmax/argmin via max_by/min_by — ONE combinable
    aggregate instead of the window-rank-filter detour (no per-group
    sort, no second shuffle; each partial keeps a single champion row
    per group). Ties are broken deterministically by carrying
    c_custkey inside the comparison struct (lexicographic struct
    ordering), which the oracle mirrors with an explicit two-key
    ORDER BY."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.max_by(
                "c_name", F.struct(F.col("c_acctbal"), F.col("c_custkey"))
            ).alias("richest"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.min_by(
                "c_name", F.struct(F.col("c_acctbal"), F.col("c_custkey"))
            ).alias("poorest"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        )
        .select("c_nationkey", "richest", "max_bal", "poorest", "min_bal")
        .orderBy("c_nationkey")
    )


@register(
    "agg_boolean",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderstatus = 'F') AS any_finished
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("aggregate", "boolean"),
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family — count_if / bool_and (EVERY) /
    bool_or (ANY): predicate summaries in one combinable pass, the
    data-quality-assertion shape (\"did every row satisfy X; did any
    row hit Y\") that at scale must never become N per-predicate
    scans."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_regression",
    oracle="""
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "regression"),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ordinary-least-squares via the SQL-standard regr_*
    aggregates (price ~ quantity per return flag): slope, intercept,
    R². These are sufficient-statistic aggregates (sums of x, y, xy,
    x², y²), so they partial-aggregate map-side like any sum — the
    way a 100 TB fit must run; results rounded since the engines sum
    doubles in different orders."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 4
            ).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "set_ops_all",
    oracle="""
SELECT custkey, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
    )
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY custkey
ORDER BY custkey
""",
    tags=("setop", "bag"),
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — INTERSECT ALL (min of
    multiplicities) chained into EXCEPT ALL (multiplicity
    subtraction) on order custkeys, materialized as (key, count) for
    order-stable comparison. Spark plans these as multiplicity
    aggregates (one shuffle per operand pair), not the row-pairing
    join a naive translation would do."""
    orders = load_table(spark, sf_dir, "orders")
    open_keys = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    big_keys = orders.where(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    finished_keys = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        open_keys.intersectAll(big_keys)
        .exceptAll(finished_keys)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("custkey")
    )


@register(
    "fn_bitwise",
    oracle="""
SELECT event_id,
       CAST(event_id & 255 AS BIGINT) AS low_byte,
       CAST(event_id | 4096 AS BIGINT) AS with_flag,
       CAST(xor(event_id, user_id) AS BIGINT) AS xored,
       CAST((event_id & 255) << 3 AS BIGINT) AS shifted,
       CAST(bit_count(event_id) AS INT) AS popcount
FROM events
""",
    tags=("function", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family — AND/OR/XOR masks, shifts, popcount:
    the flag-word decode / hash-mixing toolbox, all whole-stage
    codegen."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("event_id").bitwiseAND(F.lit(255))).alias("low_byte"),
        (F.col("event_id").bitwiseOR(F.lit(4096))).alias("with_flag"),
        (F.col("event_id").bitwiseXOR(F.col("user_id"))).alias("xored"),
        F.shiftleft(F.col("event_id").bitwiseAND(F.lit(255)), 3)
        .cast("bigint")
        .alias("shifted"),
        F.bit_count("event_id").alias("popcount"),
    )


HH_K = 10
HH_CAPACITY = 64


@register(
    "agg_heavy_hitters",
    oracle=f"""
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM tok
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT {HH_K}
""",
    tags=("aggregate", "heavy-hitters", "text"),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus top-{k} tokens by the two-phase Misra-Gries
    candidate + exact-recount plan (operators/heavy_hitters.py): each
    partition streams through a capacity-bounded sketch (no shuffle),
    then only the O(partitions × capacity) candidate keys are
    recounted exactly via broadcast semi-join + combinable groupBy.
    Against a web-scale key domain (URLs, n-grams) this bounds the
    shuffle by the candidate set instead of the full domain; the
    oracle is the plain exact top-k, so the driver check also proves
    candidate completeness on this corpus. Deterministic under count
    ties via (n DESC, token) ordering."""
    docs = load_table(spark, sf_dir, "documents")
    from target_iceberg_spark.operators.heavy_hitters import heavy_hitters_exact

    tokens = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    return heavy_hitters_exact(tokens, k=HH_K, capacity=HH_CAPACITY)


@register(
    "agg_mom_growth",
    oracle="""
WITH m AS (
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
               AS month,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY month
)
SELECT month, revenue,
       ROUND(100.0 * (revenue - LAG(revenue) OVER (ORDER BY month))
             / LAG(revenue) OVER (ORDER BY month), 4) AS mom_pct
FROM m
ORDER BY month
""",
    tags=("aggregate", "timeseries"),
)
def agg_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the raw fact volume collapses
    FIRST through a combinable month aggregate (84 rows max for a
    7-year corpus regardless of fact count), and only that bounded
    series flows through the ordered lag window — the unpartitioned
    window is safe exactly because its input is aggregate-bounded,
    the same adjudicated class as curation_domain_mix's per-source
    frame. First month's delta is NULL by definition."""
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("month")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("month")
    return (
        m.select(
            "month",
            "revenue",
            F.round(
                100.0
                * (F.col("revenue") - F.lag("revenue").over(w))
                / F.lag("revenue").over(w),
                4,
            ).alias("mom_pct"),
        )
        .orderBy("month")
    )


@register(
    "profile_fk_integrity",
    oracle="""
SELECT 'orders->customer' AS fk,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
           AS n_orphans,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
UNION ALL
SELECT 'lineitem->orders' AS fk,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
           AS n_orphans,
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows
ORDER BY fk
""",
    tags=("profiling", "integrity"),
)
def profile_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — orphan counts per foreign-key
    edge (orders→customer, lineitem→orders), the cross-table
    data-quality gate that runs after every large ingest. Each edge is
    ONE LEFT ANTI join (orphans = fact keys with no dim match) feeding
    a 1-row count — no row payload ever moves, only keys; the dim side
    broadcasts when it fits. The two per-edge rows union into the
    audit report. On this referentially-intact corpus both orphan
    counts are 0 — the audit proves the absence."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def edge(name: str, fact: DataFrame, fkey: str, dim: DataFrame, dkey: str):
        orphans = fact.select(fkey).join(
            dim.select(dkey), fact[fkey] == dim[dkey], "left_anti"
        )
        return (
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            .crossJoin(fact.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(F.lit(name).alias("fk"), "n_orphans", "n_rows")
        )

    return (
        edge("orders->customer", orders, "o_custkey", cust, "c_custkey")
        .union(edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"))
        .orderBy("fk")
    )


@register(
    "scan_range",
    oracle="""
SELECT CAST(i AS BIGINT) AS n,
       CAST(i * i AS BIGINT) AS n_sq,
       CAST(SUM(i) OVER (PARTITION BY i % 10) AS BIGINT) AS bucket_sum
FROM (SELECT UNNEST(range(0, 1000)) AS i)
ORDER BY n
""",
    tags=("scan", "range"),
    bench=False,
)
def scan_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-IO synthetic SOURCE: spark.range generates the sequence
    directly on the executors (numSlices-partitioned, no file listing,
    no scan) — the backfill / dimension-seeding / load-generation
    primitive. A derived column and a small partitioned window prove
    the generated relation composes like any table. At 100 TB this is
    how you mass-produce date spines and surrogate-key ranges without
    touching storage."""
    return (
        spark.range(0, 1000, 1, 8)
        .select(
            F.col("id").alias("n"),
            (F.col("id") * F.col("id")).alias("n_sq"),
        )
        .withColumn(
            "bucket_sum",
            F.sum("n").over(Window.partitionBy(F.col("n") % 10)),
        )
        .orderBy("n")
    )


@register(
    "agg_listagg",
    oracle="""
WITH pairs AS (
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
)
SELECT c_nationkey,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       CAST(COUNT(*) AS BIGINT) AS n_segments
FROM pairs
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    tags=("agg", "string"),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ordered string aggregation (LISTAGG ... WITHIN
    GROUP / string_agg): per nation, the alphabetized CSV of market
    segments its customers span — the denormalized-label reshape
    reporting layers ask for constantly.

    Scale shape: the DISTINCT collapse runs FIRST (combinable, output
    ≤ nations × segments regardless of customer count), so the
    order-sensitive concatenation only ever sees the bounded pair
    table; the explicit WITHIN GROUP ordering makes the string
    deterministic in both engines (an unordered listagg is
    partition-order-dependent and can never hash-match). Never
    listagg over the raw fact table: the per-group buffer would be
    unbounded — aggregate or distinct to a bounded domain first."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
WITH pairs AS (
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
)
SELECT c_nationkey,
       listagg(c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment)
           AS segments,
       CAST(COUNT(*) AS BIGINT) AS n_segments
FROM pairs
GROUP BY c_nationkey
ORDER BY c_nationkey
""")
