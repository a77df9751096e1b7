"""Aggregation plans: hash agg, distinct, rollup (SURVEY.md §2B).

Spark's groupBy().agg() gives partial (map-side) + final aggregation
automatically — at 100 TB the shuffle moves only one row per
(partition, group), not raw data. Double-typed SUM/AVG results are
ROUND()ed identically in plan and oracle: float addition order differs
between engines (and between Spark partitions run-to-run) at ulp level.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

AGG_GROUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)       AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)  AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4)       AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)  AS avg_price,
       ROUND(AVG(l_discount), 6)       AS avg_disc,
       COUNT(*)                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "agg_histogram",
    oracle="""
SELECT CAST(FLOOR(value / 25) AS INT) AS bucket,
       COUNT(*) AS n,
       ROUND(MIN(value), 2) AS lo,
       ROUND(MAX(value), 2) AS hi,
       ROUND(AVG(value), 4) AS avg_value
FROM events
WHERE value IS NOT NULL
GROUP BY CAST(FLOOR(value / 25) AS INT)
ORDER BY bucket
""",
    tags=("agg", "profiling"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over a measure column — the data-profiling
    primitive (value distributions, outlier detection) a pipeline runs
    before setting filter thresholds. floor-division bucketing keeps the
    whole query one map-side-combinable groupBy with ~20 groups; at any
    scale the shuffle carries only the per-bucket partials."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy(F.floor(F.col("value") / 25).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("bucket")
    )


@register(
    "agg_filter_clause",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       ROUND(SUM(l_extendedprice) FILTER (WHERE l_tax > 0.04), 2) AS taxed_revenue,
       ROUND(AVG(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS avg_qty_f
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "conditional"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (the SQL FILTER clause): several
    differently-filtered measures in ONE pass over the fact table
    instead of one scan per predicate — every branch stays a combinable
    partial aggregate. The DataFrame spelling is agg(f(when(cond, x)));
    the SQL front door accepts FILTER (WHERE ...) directly."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
            F.round(
                F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 2
            ).alias("taxed_revenue"),
            F.round(
                F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 4
            ).alias("avg_qty_f"),
        )
        .orderBy("l_returnflag")
    )


@register("agg_group", oracle=AGG_GROUP_ORACLE, tags=("aggregate", "flagship"))
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter -> hash agg -> sort."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*)                AS n_events,
       ROUND(SUM(value), 2)    AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("aggregate",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (expand+two-phase agg in Spark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_salted",
    oracle="""
SELECT user_id,
       COUNT(*)             AS n_events,
       ROUND(SUM(value), 2) AS sum_value,
       MAX(value)           AS max_value
FROM events
GROUP BY user_id
""",
    tags=("aggregate", "skew"),
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase (salted) aggregation over the events
    table, whose user_id key is hot by construction (~15 users per 1k
    events). Same result as a plain groupBy — the oracle proves it —
    but the hot key spreads over 16 reducers in phase 1
    (operators/skew.py)."""
    from target_iceberg_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["user_id"],
        salt_src="event_id",
        aggs={
            "n_events": ("count", "event_id"),
            "sum_value": ("sum", "value"),
            "max_value": ("max", "value"),
        },
        buckets=16,
    )
    return out.select(
        "user_id",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        "max_value",
    )


@register(
    "agg_percentile",
    oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("aggregate",),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — Spark's
    percentile() and DuckDB's quantile_cont share the interpolation
    rule, so this is oracle-exact after rounding."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
       ROUND(var_samp(l_quantity), 6)         AS var_qty,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: stddev/variance/correlation/
    covariance (both engines use numerically-stable one-pass updates;
    rounding absorbs the ulp-level accumulation differences)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "cov_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup",
    oracle="""
SELECT r_name, n_name,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal,
       COUNT(*)                 AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("aggregate",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region ⊃ nation (GROUPING SETS under the hood)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )
