"""Rank-based and variance-decomposition statistics (SURVEY.md §2B
stats tier, round-6 post-window).

Two classical test statistics the inference tier (Welch t, chi-square,
Mann-Whitney, KS, bootstrap) was missing:

- one-way ANOVA F — does a categorical factor explain variance in a
  measure? (Fisher 1925, public.)
- Spearman rank correlation — monotone association, computed from
  tie-averaged ranks (Spearman 1904, public).

Both are engineered for exact cross-engine agreement: the ANOVA
measure (l_quantity) is integer-valued so every sum/sum-of-squares is
an exact integer in both engines; Spearman's tie-averaged ranks are
exact half-integers, so all five accumulated moments are exact and
the single final ratio is rounded once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# agg_anova_f — one-way ANOVA across return flags
# ---------------------------------------------------------------------------


@register(
    "agg_anova_f",
    oracle="""
WITH g AS (
    SELECT l_returnflag AS grp,
           COUNT(*) AS n,
           SUM(l_quantity) AS s,
           SUM(l_quantity * l_quantity) AS ss
    FROM lineitem
    GROUP BY l_returnflag
),
tot AS (
    SELECT CAST(SUM(n) AS DOUBLE) AS n_total,
           CAST(SUM(s) AS DOUBLE) AS s_total,
           CAST(COUNT(*) AS DOUBLE) AS k,
           SUM(s * s / n) AS between_raw,
           SUM(ss - s * s / n) AS ssw
    FROM g
)
SELECT CAST(n_total AS BIGINT) AS n_rows,
       CAST(k AS BIGINT) AS n_groups,
       ROUND(between_raw - s_total * s_total / n_total, 4) AS ss_between,
       ROUND(ssw, 4) AS ss_within,
       ROUND(((between_raw - s_total * s_total / n_total) / (k - 1))
             / (ssw / (n_total - k)), 6) AS f_stat
FROM tot
""",
    tags=("aggregation", "stats", "anova"),
)
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for l_quantity across the three
    return-flag groups: F = (SSB/(k-1)) / (SSW/(N-k)) with
    SSB = Σ s_g²/n_g − S²/N and SSW = Σ (ss_g − s_g²/n_g) from the
    per-group moment sums (n, Σx, Σx²).

    Scale shape: ONE combinable partial-aggregate pass over lineitem
    (count/sum/sumsq per group — map-side combine does almost all the
    work), then a k-row fold to a single row. l_quantity is
    integer-valued, so every accumulated moment is an exact integer in
    both engines — the divisions and the final F are the only floats,
    rounded once (the same exactness argument as graph_modularity's
    ratios). At 100 TB this is the cheapest possible shape: a scan
    plus a 3-row reduce; no join, no window, no second pass."""
    g = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("s"),
            F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("ss"),
        )
    )
    tot = g.agg(
        F.sum("n").cast("double").alias("n_total"),
        F.sum("s").cast("double").alias("s_total"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("between_raw"),
        F.sum(F.col("ss") - F.col("s") * F.col("s") / F.col("n")).alias("ssw"),
    )
    ssb = F.col("between_raw") - F.col("s_total") * F.col("s_total") / F.col(
        "n_total"
    )
    return tot.select(
        F.col("n_total").cast("bigint").alias("n_rows"),
        F.col("k").cast("bigint").alias("n_groups"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(F.col("ssw"), 4).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_total") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# agg_spearman — per-nation rank correlation
# ---------------------------------------------------------------------------

SPEARMAN_MIN_N = 50  # skip tiny nations (rho over a handful of rows is noise)


@register(
    "agg_spearman",
    oracle=f"""
WITH per_cust AS (
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
           COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
),
ranked AS (
    SELECT c_nationkey,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal)
             + (COUNT(*) OVER (PARTITION BY c_nationkey, c_acctbal) - 1)
               / 2.0 AS ra,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY n_orders)
             + (COUNT(*) OVER (PARTITION BY c_nationkey, n_orders) - 1)
               / 2.0 AS rb
    FROM per_cust
),
m AS (
    SELECT c_nationkey, COUNT(*) AS n,
           SUM(ra) AS sa, SUM(rb) AS sb,
           SUM(ra * ra) AS saa, SUM(rb * rb) AS sbb,
           SUM(ra * rb) AS sab
    FROM ranked
    GROUP BY c_nationkey
)
SELECT c_nationkey AS nationkey,
       CAST(n AS BIGINT) AS n_customers,
       ROUND((n * sab - sa * sb)
             / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)), 6)
           AS spearman_rho
FROM m
WHERE n >= {SPEARMAN_MIN_N}
ORDER BY nationkey
""",
    tags=("aggregation", "stats", "correlation"),
)
def agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Spearman rank correlation between a customer's
    account balance and their order count: Pearson's formula over
    tie-AVERAGED ranks (min-rank + (ties−1)/2 — exact half-integers,
    so every accumulated moment is exact in both engines and only the
    final rho is rounded). Near zero on this synthetic data — the
    point is the deterministic rank plumbing, not the effect size.

    Scale shape: order counts are ONE combinable count per customer
    (the left join keeps zero-order customers — dropping them biases
    rho); both rank windows are PARTITIONED by nation (the CI sweep
    rejects unpartitioned windows) and the tie-count is a second
    partitioned window, not a self-join; the five moments then reduce
    per nation in one combinable pass. At 100 TB ranks-within-group
    shuffle once on the group key and everything after is map-side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey"),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    wa = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    wa_ties = Window.partitionBy("c_nationkey", "c_acctbal")
    wb = Window.partitionBy("c_nationkey").orderBy("n_orders")
    wb_ties = Window.partitionBy("c_nationkey", "n_orders")
    ranked = per_cust.select(
        "c_nationkey",
        (
            F.rank().over(wa) + (F.count(F.lit(1)).over(wa_ties) - 1) / 2.0
        ).alias("ra"),
        (
            F.rank().over(wb) + (F.count(F.lit(1)).over(wb_ties) - 1) / 2.0
        ).alias("rb"),
    )
    m = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
        F.sum(F.col("ra") * F.col("ra")).alias("saa"),
        F.sum(F.col("rb") * F.col("rb")).alias("sbb"),
        F.sum(F.col("ra") * F.col("rb")).alias("sab"),
    )
    rho = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")) / F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
        * (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
    )
    return (
        m.where(F.col("n") >= SPEARMAN_MIN_N)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("n").cast("bigint").alias("n_customers"),
            F.round(rho, 6).alias("spearman_rho"),
        )
        .orderBy("nationkey")
    )
