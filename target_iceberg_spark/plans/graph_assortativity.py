"""Degree assortativity of the co-purchase graph (SURVEY.md §2B graph
tier, round-6 post-window).

Newman's assortativity coefficient (PRL 2002, public): the Pearson
correlation of the degrees at the two ends of every edge. r > 0 means
hubs link to hubs (social-network shape), r < 0 means hubs link to
leaves (technological/retail shape) — the one-number summary that
says whether degree-targeted mitigation (hub caps in wedge joins,
salting in bucket joins) will pay off on THIS graph. Consumes the
shared content-keyed edge artifact (plans/graph_edges.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.graph_edges import copurchase_edges
from target_iceberg_spark.plans.registry import register

ASSORT_SUPPORT = 2  # same graph as kcore / LPA / modularity


@register(
    "graph_assortativity",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT pa, pb FROM pairs
    GROUP BY pa, pb HAVING COUNT(*) >= {ASSORT_SUPPORT}
),
deg AS (
    SELECT node, COUNT(*) AS d
    FROM (SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges)
    GROUP BY node
),
-- each undirected edge contributes BOTH orientations, so the moment
-- sums are symmetric and the Pearson form needs no x/y distinction
ends AS (
    SELECT da.d AS dx, db.d AS dy
    FROM edges e JOIN deg da ON e.pa = da.node
                 JOIN deg db ON e.pb = db.node
    UNION ALL
    SELECT db.d, da.d
    FROM edges e JOIN deg da ON e.pa = da.node
                 JOIN deg db ON e.pb = db.node
),
m AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(dx) AS DOUBLE) AS sx,
           CAST(SUM(dx * dx) AS DOUBLE) AS sxx,
           CAST(SUM(dx * dy) AS DOUBLE) AS sxy
    FROM ends
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       ROUND(sx / n, 4) AS mean_end_degree,
       ROUND((n * sxy - sx * sx) / (n * sxx - sx * sx), 6)
           AS assortativity
FROM m
""",
    tags=("graph", "assortativity", "stats"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity r of the support-{ASSORT_SUPPORT}
    co-purchase graph: Pearson correlation of end degrees over the
    symmetrized edge list (both orientations of every edge, so
    Σdx = Σdy and Σdx² = Σdy² and the formula collapses to
    (nΣxy − (Σx)²) / (nΣx² − (Σx)²) — the standard undirected form).

    Scale shape: degrees are ONE combinable count over edge endpoints;
    each edge picks up its two end degrees through two equi-joins on
    the node key against the |nodes|-sized degree table
    (broadcast-able); the moments are exact integer sums (degrees are
    ints) folded in one pass, so the only float is the final rounded
    ratio — the graph_modularity exactness discipline. The edge list
    is the shared parquet artifact (plans/graph_edges.py), not a
    re-derived basket self-join."""
    edges = copurchase_edges(spark, sf_dir, ASSORT_SUPPORT)
    # localCheckpoint: `deg` (node-sized combinable count) joins BOTH
    # edge endpoints; without the cut each join side re-ran the
    # endpoint union + groupBy over the artifact scan (round-13 plan
    # audit: 10 scan nodes in one plan).
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    da = deg.select(F.col("node").alias("pa"), F.col("d").alias("dx"))
    db = deg.select(F.col("node").alias("pb"), F.col("d").alias("dy"))
    one_way = edges.join(da, "pa").join(db, "pb").select("dx", "dy")
    # The symmetrize union re-executed the whole degree-join chain per
    # branch; the symmetrized moments are exact integer combinations of
    # ONE pass over one_way (n = 2*n1, sx = SUM(dx)+SUM(dy),
    # sxx = SUM(dx^2)+SUM(dy^2), sxy = 2*SUM(dx*dy)) — degrees are
    # ints, so the sums are exact and the final doubles bit-identical.
    m1 = one_way.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("dx").alias("sdx"),
        F.sum("dy").alias("sdy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sdxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("sdyy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sdxy"),
    )
    m = m1.select(
        (F.col("n1") * 2).cast("double").alias("n"),
        (F.col("sdx") + F.col("sdy")).cast("double").alias("sx"),
        (F.col("sdxx") + F.col("sdyy")).cast("double").alias("sxx"),
        (F.col("sdxy") * 2).cast("double").alias("sxy"),
    )
    return m.select(
        (F.col("n") / 2).cast("bigint").alias("n_edges"),
        F.round(F.col("sx") / F.col("n"), 4).alias("mean_end_degree"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("assortativity"),
    )
