"""Join plans: broadcast, sort-merge, outer, semi/anti, range, as-of
(SURVEY.md §2B).

Strategy selection is explicit where it matters at scale:
  - dimension tables (region/nation/part at 100 TB fact scale) are
    broadcast — no shuffle of the fact side;
  - fact-fact joins use sort-merge (hinted where the local test data is
    small enough that Spark would otherwise broadcast);
  - the range join carries an equi prefix (user_id) so it hash-joins
    then filters the band residual instead of a cartesian BNLJ;
  - as-of has no native Spark operator — implemented with the
    union + partitioned last_value(ignorenulls) window pattern, which
    is a single shuffle on the join key (operators/asof.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.asof import asof_join
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "join_broadcast",
    oracle="""
SELECT r_name,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal,
       COUNT(*)                 AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
    tags=("join",),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim) ⋈ broadcast(dim): zero fact-side shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("r_name")
    )


@register(
    "join_sortmerge",
    oracle="""
SELECT o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("join",),
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi join; MERGE hint pins sort-merge (the strategy two
    100 TB tables get anyway once both exceed the broadcast threshold)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").hint("merge")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey,
       COUNT(o_orderkey)                       AS n_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
""",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count=0 rows)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
""",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers with at least one big order (no duplication)."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return cust.join(
        big, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_range",
    oracle="""
SELECT e1.user_id AS user_id, e1.event_id AS probe_id, COUNT(*) AS n_follow
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 60 SECOND
WHERE e1.event_type = 'error'
GROUP BY e1.user_id, e1.event_id
""",
    tags=("join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: for each error event, count same-user events
    in the following 60s. Uses the bucketed band join
    (operators/bandjoin.py): the shuffle key is (user_id, time bucket),
    so work scales with band occupancy rather than per-user history —
    a plain user_id equi prefix would put each of the ~15 hot users'
    entire timeline on one task and do O(history^2) residual filtering."""
    from target_iceberg_spark.operators.bandjoin import band_join

    ev = load_table(spark, sf_dir, "events")
    e1 = ev.where(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    e2 = ev.select("user_id", "ts")
    joined = band_join(
        e1, e2, keys=["user_id"], left_ts="ts", right_ts="ts", lower_s=0, upper_s=60
    )
    return (
        joined.groupBy(
            F.col("l.user_id").alias("user_id"), F.col("l.event_id").alias("probe_id")
        )
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )


@register(
    "join_asof",
    oracle="""
SELECT e.event_id AS event_id, e.user_id AS user_id, s.event_id AS signup_event_id
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest same-user signup at-or-before each error event.
    Spark has no native ASOF — see operators/asof.py for the
    single-shuffle union+window implementation."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    quotes = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"), "user_id", "ts"
    )
    return asof_join(
        probes,
        quotes,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=("signup_event_id",),
    ).select("event_id", "user_id", "signup_event_id")


@register(
    "join_shuffle_hash",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("join", "strategy"),
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled-hash join — the third physical strategy alongside
    broadcast (join_broadcast) and sort-merge (join_sortmerge),
    completing the matrix with the bucketed-layout join
    (join_bucketed). SHJ wins when both sides are too big to
    broadcast but ONE side's per-partition slice fits in memory:
    it skips both sort passes of SMJ and builds a hash table per
    partition instead (no spillable sort, but the build side must
    fit — which is why Spark only picks it under the hint or
    preferSortMergeJoin=false). Plan-asserted ShuffledHashJoin in
    tests/test_plans.py; the oracle is the plain logical join —
    strategy changes the plan, never the answer."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            cust.hint("shuffle_hash"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("c_mktsegment")
    )
