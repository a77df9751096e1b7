"""Local clustering coefficients (SURVEY.md §2B graph tier, round 7,
post-window).

graph_triangles counts the GLOBAL triangle census; the per-node local
clustering coefficient c(v) = 2·tri(v) / (deg(v)·(deg(v)-1)) (Watts &
Strogatz 1998) says whether a specific hub's neighborhood is a
community (c→1) or a star (c→0) — the node-level signal behind
recommendation diversity and community seeding. Computed for the
top-degree seeds over the shared co-purchase edge artifact
(plans/graph_edges.py), the same seed discipline as graph_khop_reach.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.graph_edges import copurchase_edges
from target_iceberg_spark.plans.registry import register

CC_SUPPORT = 2  # same co-purchase threshold as kcore/triangles/reach
CC_SEEDS = 15  # top-degree nodes scored


@register(
    "graph_clustering_local",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= {CC_SUPPORT}
),
adj AS MATERIALIZED (
    SELECT pa AS u, pb AS v FROM edges
    UNION ALL
    SELECT pb AS u, pa AS v FROM edges
),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM adj GROUP BY u),
seeds AS MATERIALIZED (
    SELECT node, degree FROM deg ORDER BY degree DESC, node LIMIT {CC_SEEDS}
),
wedges AS (
    SELECT s.node, a1.v AS x, a2.v AS y
    FROM seeds s
    JOIN adj a1 ON a1.u = s.node
    JOIN adj a2 ON a2.u = s.node AND a1.v < a2.v
),
tri AS (
    SELECT w.node, CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM wedges w JOIN edges e ON e.pa = w.x AND e.pb = w.y
    GROUP BY w.node
)
SELECT s.node, s.degree,
       CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
       ROUND(2.0 * COALESCE(t.n_tri, 0)
             / (s.degree * (s.degree - 1)), 4) AS clustering
FROM seeds s LEFT JOIN tri t ON t.node = s.node
WHERE s.degree >= 2
ORDER BY s.degree DESC, s.node
""",
    tags=("graph", "clustering", "triangles"),
)
def graph_clustering_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watts–Strogatz local clustering coefficient for the
    {CC_SEEDS} highest-degree co-purchase nodes: enumerate each
    seed's neighbor pairs (wedges, canonically x < y so each pair
    counts once), check which are themselves edges with ONE equi-join
    against the canonical edge list, and report
    c = 2·closed / (deg·(deg-1)).

    Scale shape: the edge list is the content-keyed artifact scan;
    wedges explode only from the {CC_SEEDS}-row broadcast seed set
    (fanout deg(seed)² — bounded by the seed count times the max
    degree squared, the price of an EXACT hub coefficient; the
    all-nodes form at 100 TB caps wedge fanout by degree-sampling,
    the graph_link_prediction discipline); closure is a single
    (x, y) equi-join, counts combinable."""
    edges = copurchase_edges(spark, sf_dir, CC_SUPPORT)
    adj = edges.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        edges.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    # localCheckpoint: `seeds` (CC_SEEDS rows) feeds the wedge build
    # AND the final report join — each re-derived the degree groupBy +
    # top-k over the artifact scan (the graph_khop_reach cut).
    seeds = (
        deg.orderBy(F.col("degree").desc(), "node")
        .limit(CC_SEEDS)
        .localCheckpoint()
    )
    a1 = adj.select(F.col("u").alias("node"), F.col("v").alias("x"))
    a2 = adj.select(F.col("u").alias("node"), F.col("v").alias("y"))
    wedges = (
        F.broadcast(seeds.select("node"))
        .join(a1, "node")
        .join(a2, "node")
        .where(F.col("x") < F.col("y"))
    )
    tri = (
        wedges.join(
            edges,
            (F.col("x") == F.col("pa")) & (F.col("y") == F.col("pb")),
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        seeds.join(tri, "node", "left")
        .where(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.round(
                2.0
                * F.coalesce("n_tri", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                4,
            ).alias("clustering"),
        )
        .orderBy(F.col("degree").desc(), "node")
    )
