"""Adamic-Adar link prediction over the co-purchase graph
(SURVEY.md §2B graph tier, round 9).

Common-neighbor COUNTING (graph_link_prediction) treats a shared
neighbor of degree 2 and a shared hub of degree 5000 as equal
evidence. Adamic & Adar ("Friends and neighbors on the web", Social
Networks 2003, public) weight each witness by 1/ln(deg): rare shared
neighbors dominate, hubs contribute almost nothing — the default
link-prediction baseline in the GNN literature and the better
substitute-detection rank on retail graphs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.graph_edges import copurchase_edges
from target_iceberg_spark.plans.registry import register

AA_SUPPORT = 2  # co-purchase support threshold (shared graph tier)
AA_DEG_CAP = 50  # wedge-center degree cap (hub mitigation)
AA_TOP = 15


@register(
    "graph_adamic_adar",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT pa, pb FROM pairs
    GROUP BY pa, pb HAVING COUNT(*) >= {AA_SUPPORT}
),
adj AS (
    SELECT pa AS node, pb AS nbr FROM edges
    UNION ALL
    SELECT pb, pa FROM edges
),
deg AS (
    SELECT node, COUNT(*) AS d FROM adj GROUP BY node
),
capped AS (
    SELECT a.node, a.nbr, dc.d AS dc
    FROM adj a JOIN deg dc ON a.nbr = dc.node
    WHERE dc.d <= {AA_DEG_CAP}
),
wedges AS (
    SELECT x.node AS a, y.node AS b,
           CAST(COUNT(*) AS BIGINT) AS cn,
           SUM(1.0 / ln(x.dc)) AS aa
    FROM capped x JOIN capped y
      ON x.nbr = y.nbr AND x.node < y.node
    GROUP BY x.node, y.node
),
cand AS (
    SELECT w.a, w.b, w.cn, w.aa
    FROM wedges w
    LEFT JOIN edges e ON w.a = e.pa AND w.b = e.pb
    WHERE e.pa IS NULL
)
SELECT a AS part_a, b AS part_b, cn AS common_nbrs,
       ROUND(aa, 6) AS adamic_adar
FROM cand
ORDER BY adamic_adar DESC, part_a, part_b
LIMIT {AA_TOP}
""",
    tags=("graph", "linkprediction", "mining"),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{AA_TOP} predicted links by Adamic-Adar: for every
    not-yet-connected part pair, sum 1/ln(deg(z)) over shared
    neighbors z — wedge enumeration identical to
    graph_link_prediction (one equi-join through the wedge center,
    {AA_DEG_CAP}-degree center cap mirrored in the oracle), with the
    witness weight joined onto the adjacency BEFORE wedges form so
    the aggregate never revisits the degree table per wedge.

    Scale shape: wedge volume through a degree-d center is d², so the
    cap bounds the join fan-out; the weight is a column on the capped
    adjacency (no per-wedge lookup); existing edges are removed by
    one anti-join on the canonical orientation; the AA sum is a
    combinable per-pair aggregate and TakeOrderedAndProject keeps
    {AA_TOP} rows. Reads the shared content-keyed co-purchase edge
    artifact (plans/graph_edges.py) rather than re-deriving it."""
    edges = copurchase_edges(spark, sf_dir, AA_SUPPORT).localCheckpoint()
    adj = edges.select(
        F.col("pa").alias("node"), F.col("pb").alias("nbr")
    ).unionAll(edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr")))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    capped = (
        adj.join(
            deg.select(F.col("node").alias("nbr"), F.col("d").alias("dc")),
            "nbr",
        )
        .where(F.col("dc") <= AA_DEG_CAP)
    )
    x = capped.alias("x")
    y = capped.select("node", "nbr").alias("y")
    wedges = (
        x.join(
            y,
            (F.col("x.nbr") == F.col("y.nbr"))
            & (F.col("x.node") < F.col("y.node")),
        )
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum(F.lit(1.0) / F.log(F.col("x.dc"))).alias("aa"),
        )
    )
    cand = wedges.join(
        edges.select(F.col("pa").alias("a"), F.col("pb").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return (
        cand.select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            F.col("cn").alias("common_nbrs"),
            F.round("aa", 6).alias("adamic_adar"),
        )
        .orderBy(F.desc("adamic_adar"), "part_a", "part_b")
        .limit(AA_TOP)
    )
