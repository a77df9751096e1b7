"""Association-rule mining over the co-purchase graph (SURVEY.md §2B
mining tier, round-6 post-window).

Completes the market-basket arc: agg_copurchase counts pairs,
graph_also_bought recommends, this ranks directed rules a=>b by LIFT
(Agrawal & Srikant VLDB'94, public) — confidence normalized by the
consequent's base rate, the score that separates "bought together
because both are popular" from genuine association.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.graph_edges import copurchase_pair_counts
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

RULE_SUPPORT = 2  # min shared orders (same as the graph tier)
RULE_TOP = 15


@register(
    "mining_association_rules",
    oracle=f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM items
),
item_n AS (
    SELECT l_partkey, COUNT(*) AS n_item FROM items GROUP BY l_partkey
),
pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_pair
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY pa, pb
    HAVING COUNT(*) >= {RULE_SUPPORT}
),
rules AS (
    SELECT pa AS antecedent, pb AS consequent, n_pair FROM pairs
    UNION ALL
    SELECT pb, pa, n_pair FROM pairs
)
SELECT r.antecedent, r.consequent,
       CAST(r.n_pair AS BIGINT) AS n_both,
       ROUND(CAST(r.n_pair AS DOUBLE) / ia.n_item, 6) AS confidence,
       ROUND(CAST(r.n_pair AS DOUBLE) * n_orders.n
             / (ia.n_item * ic.n_item), 6) AS lift
FROM rules r
JOIN item_n ia ON r.antecedent = ia.l_partkey
JOIN item_n ic ON r.consequent = ic.l_partkey
CROSS JOIN n_orders
ORDER BY lift DESC, antecedent, consequent
LIMIT {RULE_TOP}
""",
    tags=("mining", "basket", "rules"),
)
def mining_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{RULE_TOP} association rules a=>b over parts sharing >=
    {RULE_SUPPORT} orders, ranked by lift = P(a,b) / (P(a)·P(b)) =
    n_both·N / (n_a·n_b), with confidence P(b|a) reported alongside —
    the classic rule-quality pair (support/confidence/lift).

    Scale shape: the pair counts come from the shared content-keyed
    co-purchase artifact (plans/graph_edges.py) — a pruned parquet
    scan, not a re-derived basket self-join; per-item order counts are
    ONE combinable aggregate over distinct items; each rule picks up
    its antecedent/consequent base rates through two equi-joins on the
    part key (broadcast-able: the item-count side is |parts|-sized);
    the total-order count is a 1-row broadcast; the cut is
    TakeOrderedAndProject. Lift and confidence are ratios of exact
    integers, rounded at 6 — the established cross-engine float
    discipline; ties break on the part ids."""
    pairs = (
        copurchase_pair_counts(spark, sf_dir)
        .where(F.col("n") >= RULE_SUPPORT)
        .withColumnRenamed("n", "n_pair")
    )
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = items.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_total")
    )
    # localCheckpoint: `item_n` (|parts|-sized combinable count) joins
    # BOTH rule endpoints — each join side re-ran the corpus-sized
    # lineitem distinct without the cut (round-13 plan audit).
    item_n = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .localCheckpoint()
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "n_pair",
    ).unionAll(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "n_pair",
        )
    )
    ia = item_n.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    ic = item_n.select(
        F.col("l_partkey").alias("consequent"), F.col("n_item").alias("n_c")
    )
    return (
        rules.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            F.col("n_pair").cast("bigint").alias("n_both"),
            F.round(F.col("n_pair").cast("double") / F.col("n_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_pair").cast("double")
                * F.col("n_total")
                / (F.col("n_a") * F.col("n_c")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(RULE_TOP)
    )
