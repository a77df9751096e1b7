"""Scalar-function family plans: string, date, math, array, json
(SURVEY.md §2B).

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; no Python in the hot path. Cross-engine typing
rules applied in the oracles: DuckDB widens length()/year()/etc. to
BIGINT where Spark yields INT (cast in oracle); transcendentals (ln)
are rounded since libm vs JVM differ in the last ulp; sqrt is IEEE
correctly-rounded so needs no rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "fn_string",
    oracle="""
SELECT p_partkey,
       UPPER(p_name)                        AS name_upper,
       SUBSTRING(p_type, 1, 3)              AS type_prefix,
       CONCAT_WS('|', p_brand, p_type)      AS brand_type,
       CAST(LENGTH(p_name) AS INT)          AS name_len,
       REPLACE(p_name, ' ', '_')            AS name_snake,
       LPAD(p_brand, 10, '*')               AS brand_padded,
       REGEXP_MATCHES(p_name, 'wid')        AS is_widget
FROM part
WHERE p_name LIKE '%e%'
""",
    tags=("function", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part."""
    part = load_table(spark, sf_dir, "part")
    return part.where(F.col("p_name").like("%e%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.lpad("p_brand", 10, "*").alias("brand_padded"),
        F.col("p_name").rlike("wid").alias("is_widget"),
    )


@register(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)                          AS o_year,
       CAST(month(o_orderdate) AS INT)                         AS o_month,
       CAST(day(o_orderdate) AS INT)                           AS o_day,
       CAST(quarter(o_orderdate) AS INT)                       AS o_quarter,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')  AS month_start,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
                                                               AS days_to_2002,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')    AS due_date
FROM orders
""",
    tags=("function", "date"),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over orders."""
    orders = load_table(spark, sf_dir, "orders")
    odate = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), odate).alias("days_to_2002"),
        F.date_format(F.date_add(odate, 30), "yyyy-MM-dd").alias("due_date"),
    )


@register(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1)           AS price_r,
       ABS(l_discount - 0.05)              AS disc_dev,
       ROUND(LN(l_extendedprice), 6)       AS ln_price,
       SQRT(l_quantity)                    AS sqrt_qty,
       l_quantity * l_quantity             AS qty_sq,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_tax * 100) AS BIGINT)   AS tax_pct_ceil,
       l_orderkey % 7                      AS key_mod
FROM lineitem
WHERE l_extendedprice > 0
""",
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_extendedprice") > 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "fn_array",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       embedding[1]                AS first_val,
       ROUND(SQRT(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       ROUND(list_sum(list_transform(list_slice(embedding, 1, 8),
             x -> CAST(x AS DOUBLE))), 6) AS head_sum
FROM embeddings
""",
    tags=("function", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over embeddings (size/index/fold/slice)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    head_sum = F.aggregate(
        F.slice("embedding", 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(head_sum, 6).alias("head_sum"),
    )


@register(
    "fn_json",
    oracle="""
SELECT event_type,
       COUNT(*)                 AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)    AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
GROUP BY event_type
ORDER BY event_type
""",
    tags=("function", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + predicate + aggregate over events.props."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .where(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_unpivot",
    oracle="""
SELECT p_partkey, metric, value
FROM (
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
    FROM part WHERE p_size <= 3
    UNION ALL
    SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part WHERE p_size <= 3
)
ORDER BY p_partkey, metric
""",
    tags=("function", "reshape"),
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the wide->long inverse of agg_pivot, the
    reshape every metrics pipeline needs before a generic
    (entity, metric, value) sink. Uses Spark's native
    ``DataFrame.unpivot`` (the UNPIVOT SQL clause / melt), which plans
    as a single Expand over the scan: each input row fans out to one
    row per measure column with ZERO shuffle and no join — at 100 TB
    the operation is embarrassingly parallel and column pruning still
    reaches the scan (only the id + measure columns are read). The
    oracle states the same thing as the portable UNION ALL form."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.where(F.col("p_size") <= 3)
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot("p_partkey", ["retailprice", "size"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


@register(
    "profile_columns",
    oracle="""
SELECT 'o_custkey' AS col,
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       ROUND(MIN(o_custkey), 4) AS min_val,
       ROUND(MAX(o_custkey), 4) AS max_val
FROM orders
UNION ALL
SELECT 'o_totalprice',
       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       ROUND(MIN(o_totalprice), 4), ROUND(MAX(o_totalprice), 4)
FROM orders
UNION ALL
SELECT 'o_orderkey',
       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
       ROUND(MIN(o_orderkey), 4), ROUND(MAX(o_orderkey), 4)
FROM orders
ORDER BY col
""",
    tags=("profiling",),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling — per-column null count, distinct count, min and
    max in ONE scan: the data-quality gate an ingestion pipeline runs
    after every load. All column profiles compute as parallel
    aggregates of the same pass (Spark plans multi-distinct via one
    Expand), then unpivot to the long (col, stats) report shape. The
    oracle's UNION ALL restates the same numbers; at 100 TB this stays
    a single combinable-aggregate scan — never one job per column."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ("o_custkey", "o_totalprice", "o_orderkey")
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__n_null"),
            F.countDistinct(c).cast("long").alias(f"{c}__n_distinct"),
            F.round(F.min(F.col(c).cast("double")), 4).alias(f"{c}__min_val"),
            F.round(F.max(F.col(c).cast("double")), 4).alias(f"{c}__max_val"),
        ]
    wide = orders.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_val").alias("min_val"),
            F.col(f"{c}__max_val").alias("max_val"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.col", "r.n_null", "r.n_distinct", "r.min_val", "r.max_val")
        .orderBy("col")
    )


@register(
    "profile_moments",
    oracle="""
WITH ps AS (
    SELECT event_type,
           CAST(COUNT(value) AS DOUBLE) AS n,
           SUM(value) AS s1,
           SUM(value * value) AS s2,
           SUM(value * value * value) AS s3,
           SUM(value * value * value * value) AS s4
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
),
m AS (
    SELECT event_type, n,
           s2 / n - (s1 / n) * (s1 / n) AS m2,
           s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
           s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
    FROM ps
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       ROUND(m2, 4) AS variance_pop,
       ROUND(m3 / POW(m2, 1.5), 4) AS skewness,
       ROUND(m4 / (m2 * m2) - 3, 4) AS kurtosis_excess
FROM m
ORDER BY event_type
""",
    tags=("profile", "moments"),
)
def profile_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment distribution profile per event type — population
    variance, skewness, excess kurtosis — the shape diagnostics a data-
    quality gate adds on top of profile_columns' min/max/nulls (a value
    column silently turning bimodal or heavy-tailed moves these before
    it moves min/max).

    Built from POWER SUMS (n, Σx, Σx², Σx³, Σx⁴) — one combinable
    aggregate pass, each partition ships 5 numbers per group, then the
    central-moment algebra runs on the 5-row result; the same
    sufficient-statistic shape as agg_regression, and the reason this
    stays one scan at 100 TB. Both engines evaluate the IDENTICAL
    formula (Spark's built-in skewness/kurtosis and DuckDB's disagree
    on bias correction, so neither is used); ROUND(4) collapses
    sum-order ulp skew."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = F.col("value")
    ps = ev.groupBy("event_type").agg(
        F.count(v).cast("double").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = (
        F.col("s3") / F.col("n")
        - 3 * mean * (F.col("s2") / F.col("n"))
        + 2 * mean * mean * mean
    )
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * mean * mean * (F.col("s2") / F.col("n"))
        - 3 * mean * mean * mean * mean
    )
    return ps.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(m2, 4).alias("variance_pop"),
        F.round(m3 / F.pow(m2, F.lit(1.5)), 4).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 4).alias("kurtosis_excess"),
    ).orderBy("event_type")
