"""k-hop reachability (SURVEY.md §2B graph tier, round 7).

"How much of the graph can a node touch in two hops?" is the
neighborhood-size primitive under recommendation breadth, influence
estimates, and sampling fan-out budgets (the BFS layer of HyperANF /
Palmer et al.'s ANF, computed exactly here for a seed set). Runs on
the shared co-purchase edge artifact (plans/graph_edges.py) like the
rest of the graph tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.graph_edges import copurchase_edges

REACH_SUPPORT = 2  # same co-purchase threshold as kcore/triangles
REACH_SEEDS = 10  # top-degree seed nodes


@register(
    "graph_khop_reach",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= {REACH_SUPPORT}
),
adj AS MATERIALIZED (
    SELECT pa AS u, pb AS v FROM edges
    UNION ALL
    SELECT pb AS u, pa AS v FROM edges
),
deg AS (
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM adj GROUP BY u
),
seeds AS MATERIALIZED (
    SELECT node, degree FROM deg
    ORDER BY degree DESC, node LIMIT {REACH_SEEDS}
),
hop1 AS MATERIALIZED (
    SELECT DISTINCT s.node AS seed, a.v AS n1
    FROM seeds s JOIN adj a ON a.u = s.node
),
hop2 AS (
    SELECT h.seed, a2.v AS n2
    FROM hop1 h JOIN adj a2 ON a2.u = h.n1
    UNION
    SELECT seed, n1 AS n2 FROM hop1
)
SELECT s.node AS seed, s.degree,
       CAST((SELECT COUNT(*) FROM hop1 h WHERE h.seed = s.node) AS BIGINT)
           AS reach_1hop,
       CAST((SELECT COUNT(DISTINCT n2) FROM hop2 h2
             WHERE h2.seed = s.node AND h2.n2 <> s.node) AS BIGINT)
           AS reach_2hop
FROM seeds s
ORDER BY degree DESC, seed
""",
    tags=("graph", "reachability", "bfs"),
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-hop reachability for the {REACH_SEEDS} highest-degree
    nodes of the co-purchase graph: reach_1hop = distinct neighbors,
    reach_2hop = distinct nodes within two edges (seed itself
    excluded) — the exact-BFS layer of the ANF/HyperANF
    neighborhood-function family (Palmer–Gibbons–Faloutsos KDD'02),
    restricted to a seed set so it stays a bounded report. Seeds tie-
    break on node id, so the top-{REACH_SEEDS} cut is deterministic.

    Scale shape: the edge list comes from the content-keyed artifact
    (a pruned parquet scan); degree is one combinable count; the two
    hops are equi-joins FROM the {REACH_SEEDS}-row seed/frontier side
    against the adjacency (broadcast the frontier, never the graph),
    and the distinct collapses (seed, node) pairs bounded by
    seeds × nodes. For all-nodes reach at 100 TB you'd switch to the
    HyperANF HLL-per-node form (agg_hll_rollup shows the sketch); for
    a seed report the exact join IS the right plan."""
    edges = copurchase_edges(spark, sf_dir, REACH_SUPPORT)
    adj = edges.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionAll(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    # localCheckpoint: `seeds` (REACH_SEEDS rows) feeds hop1 AND the
    # final report join; `hop1` (seeds x neighbors, bounded) feeds both
    # hop2 branches, r1, and nothing else re-derives the adjacency +
    # degree + top-k chain per consumer (round-13 plan audit: 32
    # artifact scans in one query without the cuts).
    seeds = (
        deg.orderBy(F.col("degree").desc(), "node")
        .limit(REACH_SEEDS)
        .localCheckpoint()
    )
    hop1 = (
        F.broadcast(seeds.select(F.col("node").alias("seed")))
        .join(adj, F.col("u") == F.col("seed"))
        .select("seed", F.col("v").alias("n1"))
        .distinct()
        .localCheckpoint()
    )
    hop2 = (
        F.broadcast(hop1)
        .join(adj.withColumnRenamed("u", "h_u"), F.col("h_u") == F.col("n1"))
        .select("seed", F.col("v").alias("n2"))
        .unionAll(hop1.select("seed", F.col("n1").alias("n2")))
        .distinct()
    )
    r1 = hop1.groupBy("seed").agg(F.count(F.lit(1)).alias("reach_1hop"))
    r2 = (
        hop2.where(F.col("n2") != F.col("seed"))
        .groupBy("seed")
        .agg(F.count(F.lit(1)).alias("reach_2hop"))
    )
    return (
        seeds.join(r1, seeds["node"] == r1["seed"], "left")
        .drop("seed")
        .join(r2, seeds["node"] == r2["seed"], "left")
        .drop("seed")
        .select(
            F.col("node").alias("seed"),
            "degree",
            F.coalesce("reach_1hop", F.lit(0)).alias("reach_1hop"),
            F.coalesce("reach_2hop", F.lit(0)).alias("reach_2hop"),
        )
        .orderBy(F.col("degree").desc(), "seed")
    )
