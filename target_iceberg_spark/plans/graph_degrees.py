"""Degree-distribution histogram (SURVEY.md §2B graph tier, round 7,
post-window).

agg_powerlaw_alpha fits ONE number to a heavy tail; this shows the
whole curve: log2-binned degree counts with the complementary CDF —
the plot every graph paper opens with (Faloutsos³'s power-law
internet plots), reduced to a bounded table. Shares the co-purchase
edge artifact and degree frame with the rest of the graph tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.graph_edges import copurchase_edges
from target_iceberg_spark.plans.registry import register

DEG_SUPPORT = 2  # same threshold as kcore/triangles/reach/clustering


@register(
    "graph_degree_histogram",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= {DEG_SUPPORT}
),
deg AS (
    SELECT u, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT pa AS u FROM edges UNION ALL SELECT pb AS u FROM edges)
    GROUP BY u
),
binned AS (
    SELECT CAST(FLOOR(log2(degree)) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1
)
SELECT bin,
       CAST(POW(2, bin) AS BIGINT) AS min_degree,
       n_nodes,
       ROUND(SUM(n_nodes) OVER (ORDER BY bin DESC
                                ROWS UNBOUNDED PRECEDING)
             / CAST(SUM(n_nodes) OVER () AS DOUBLE), 4) AS ccdf
FROM binned
ORDER BY bin
""",
    tags=("graph", "degrees", "distribution"),
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned degree histogram of the co-purchase graph with the
    complementary CDF (share of nodes at-or-above each bin) — the
    distribution curve agg_powerlaw_alpha summarizes to one exponent,
    kept as a bounded ~log2(max_degree)-row table.

    Scale shape: the edge artifact scan + ONE combinable degree count
    + one combinable bin count; the CCDF windows run over the
    ≤ log2(max_degree) binned rows (aggregate-bounded window class).
    Nothing after the degree count scales with the graph."""
    edges = copurchase_edges(spark, sf_dir, DEG_SUPPORT)
    nodes = edges.select(F.col("pa").alias("u")).unionAll(
        edges.select(F.col("pb").alias("u"))
    )
    deg = nodes.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    binned = deg.groupBy(
        F.floor(F.log2("degree")).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n_nodes"))
    w_desc = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return binned.select(
        "bin",
        F.pow(F.lit(2.0), F.col("bin")).cast("long").alias("min_degree"),
        "n_nodes",
        F.round(
            F.sum("n_nodes").over(w_desc)
            / F.sum("n_nodes").over(w_all).cast("double"),
            4,
        ).alias("ccdf"),
    ).orderBy("bin")
