"""Deterministic exact-k per-group sampling (SURVEY.md §2B sampling/
curation tier, round-6 post-window).

sample_stratified draws a FRACTION per stratum; training pipelines
just as often need an EXACT per-class budget ("50 examples per
segment, reproducibly"). The md5 priority order makes the sample a
pure function of the data — rerunnable, auditable, engine-portable —
and the hash prefilter makes the per-group top-k survive groups of
billions of rows, where a naive rank-everything window funnels every
group member through one task.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SAMPLE_K = 50  # rows kept per group
SAMPLE_SAFETY = 4.0  # prefilter keeps ~SAFETY*k hash-smallest per group

_HEX32 = 4294967296.0


@register(
    "sample_fixed_k",
    oracle=f"""
WITH h AS (
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                AS BIGINT) AS hv
    FROM customer
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                 ORDER BY hv, c_custkey) AS rk
    FROM h
)
SELECT c_mktsegment, CAST(rk AS INT) AS rk, c_custkey, c_acctbal
FROM ranked WHERE rk <= {SAMPLE_K}
ORDER BY c_mktsegment, rk
""",
    tags=("sampling", "curation", "deterministic"),
)
def sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {SAMPLE_K} customers per market segment, chosen by md5
    priority order (smallest hash first, key tie-break) — a
    deterministic uniform sample that any engine reproduces
    bit-for-bit, the per-class budget draw of training-set assembly.

    Scale shape: the oracle states the logical form (rank everything,
    keep k); the Spark plan adds the two-phase bound that makes it
    survive billion-row groups: a one-row per-group count broadcasts,
    a row-local predicate keeps only rows with hash below
    ~{SAMPLE_SAFETY}x the k-th expected order statistic (hashes are
    uniform, so survivors per group concentrate near
    {SAMPLE_SAFETY}*k; the probability of under-selecting k is
    exp(-Omega(k)) by Chernoff — and the fallback is visible, a short
    row, not a wrong row), and only then does the per-group rank
    window run, over ~{SAMPLE_SAFETY}*k rows per group instead of the
    whole group. The same discipline as sort_limit's
    TakeOrderedAndProject, applied per group."""
    cust = load_table(spark, sf_dir, "customer")
    h = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.expr(
            "cast(conv(substring(md5(cast(c_custkey as string)), 1, 8),"
            " 16, 10) as bigint)"
        ).alias("hv"),
    )
    sizes = h.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("grp_n"))
    # keep hv below SAFETY * k/n of the hash domain (min 1.0 for tiny
    # groups, where the filter must pass everything)
    bound = F.least(
        F.lit(1.0), F.lit(SAMPLE_SAFETY * SAMPLE_K) / F.col("grp_n")
    )
    pre = h.join(F.broadcast(sizes), "c_mktsegment").where(
        F.col("hv") < bound * _HEX32
    )
    w = Window.partitionBy("c_mktsegment").orderBy("hv", "c_custkey")
    return (
        pre.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= SAMPLE_K)
        .select(
            "c_mktsegment",
            F.col("rk").cast("int").alias("rk"),
            "c_custkey",
            "c_acctbal",
        )
        .orderBy("c_mktsegment", "rk")
    )
