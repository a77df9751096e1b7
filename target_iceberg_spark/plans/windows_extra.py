"""Range-frame window + timestamp scalar family (SURVEY.md §2B
extensions).

The range frame orders on integer day offsets (Spark range frames need
a numeric ordering column); the 30-day trailing spend is the classic
sliding-aggregate shape. DuckDB computes windowed sums with a segment
tree (different addition order than Spark's running buffer) — the
2-decimal ROUND absorbs the ulp-level difference.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "win_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d,
       COUNT(*) OVER w AS n_orders_30d
FROM orders
WINDOW w AS (
    PARTITION BY o_custkey
    ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
)
""",
    tags=("window",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer: a RANGE frame over day
    offsets (value-based, unlike the ROWS frame in win_running_sum)."""
    orders = load_table(spark, sf_dir, "orders")
    day_off = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy(day_off).rangeBetween(-30, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


@register(
    "win_distribution",
    oracle="""
SELECT c_custkey,
       CAST(ntile(4) OVER w AS INT)        AS acctbal_quartile,
       ROUND(percent_rank() OVER w, 6)     AS pct_rank,
       ROUND(cume_dist() OVER w, 6)        AS cume,
       CAST(dense_rank() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_nationkey) AS INT) AS nation_dense_rank,
       c_mktsegment
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    tags=("window",),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: ntile quartiles, percent_rank,
    cume_dist, dense_rank — all exact rationals of row positions, so
    engine-portable (rounded only for the division results)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w2 = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).alias("acctbal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w2).alias("nation_dense_rank"),
        "c_mktsegment",
    )


@register(
    "agg_collect",
    oracle="""
SELECT event_type,
       array_to_string(list_sort(list_distinct(array_agg(user_id))), ',') AS user_ids,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("aggregate", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the distinct user set per event type as a
    SORTED, comma-joined string (collect order is nondeterministic in
    both engines; sorting makes the value comparable, and serializing
    scalar-side keeps the result hashable for pandas canonicalizers
    that cannot factorize list columns)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.array_join(F.sort_array(F.collect_set("user_id")), ",").alias(
                "user_ids"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_regexp",
    oracle="""
SELECT doc_id,
       regexp_extract(source, '([0-9]+)', 1) AS src_num,
       regexp_matches(text, 'spark (query|table|join)') AS has_spark_phrase,
       CAST(len(regexp_extract_all(text, '\\b(fast|slow)\\b')) AS INT) AS speed_hits,
       regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS redacted_head
FROM documents
""",
    tags=("function", "regexp"),
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family — extract / match / count / global replace.
    Patterns restricted to the syntax subset where Java regex (Spark)
    and RE2 (DuckDB) agree: char classes, alternation, word boundaries;
    no backrefs or lookarounds. regexp_count maps to DuckDB
    len(regexp_extract_all); Spark's regexp_replace is global by
    default, matching DuckDB's 'g' flag."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)", 1).alias("src_num"),
        F.col("text").rlike("spark (query|table|join)").alias("has_spark_phrase"),
        F.regexp_count("text", F.lit(r"\b(fast|slow)\b")).alias("speed_hits"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias(
            "redacted_head"
        ),
    )
