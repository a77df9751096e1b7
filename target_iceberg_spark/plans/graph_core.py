"""k-core decomposition over the co-purchase graph (SURVEY.md §2B
graph tier, round-5 post-window).

The third classic graph primitive next to PageRank (operators/
pagerank.py) and triangle counting (mining.py): iteratively peel
nodes of degree < k until the k-core remains — the standard dense-
subgraph extractor for community seeding and spam-ring detection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.graph_edges import copurchase_edges
from target_iceberg_spark.plans.registry import register

KCORE_K = 3
KCORE_ROUNDS = 3  # fixed peel rounds (see docstring)
KCORE_SUPPORT = 2  # co-purchase support threshold (same as triangles)


def _round_sql(i: int) -> str:
    prev = f"e{i - 1}"
    return f"""
deg{i} AS MATERIALIZED (
    SELECT node, COUNT(*) AS deg FROM (
        SELECT pa AS node FROM {prev}
        UNION ALL
        SELECT pb FROM {prev}
    ) GROUP BY node
),
keep{i} AS (SELECT node FROM deg{i} WHERE deg >= {KCORE_K}),
e{i} AS MATERIALIZED (
    SELECT e.pa, e.pb FROM {prev} e
    JOIN keep{i} ka ON e.pa = ka.node
    JOIN keep{i} kb ON e.pb = kb.node
)"""


@register(
    "graph_kcore",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e0 AS MATERIALIZED (
    SELECT pa, pb FROM pairs
    GROUP BY pa, pb HAVING COUNT(*) >= {KCORE_SUPPORT}
),
{",".join(_round_sql(i) for i in range(1, KCORE_ROUNDS + 1))}
SELECT * FROM (
    SELECT 0 AS round,
           CAST((SELECT COUNT(*) FROM (SELECT pa FROM e0
                 UNION SELECT pb FROM e0)) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges
    {"".join(f'''
    UNION ALL
    SELECT {i},
           CAST((SELECT COUNT(*) FROM (SELECT pa FROM e{i}
                 UNION SELECT pb FROM e{i})) AS BIGINT),
           CAST((SELECT COUNT(*) FROM e{i}) AS BIGINT)''' for i in range(1, KCORE_ROUNDS + 1))}
)
ORDER BY round
""",
    tags=("graph", "kcore", "mining"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_ROUNDS} peel rounds toward the {KCORE_K}-core of the
    co-purchase graph (edges = part pairs bought together in >=
    {KCORE_SUPPORT} orders, canonically oriented): each round drops
    nodes with degree < {KCORE_K} and the edges touching them,
    reporting (nodes, edges) after every round. Fixed-round peeling is
    an UPPER BOUND on the true core (the fixpoint may need more
    rounds) — the same declared-iteration discipline as
    graph_pagerank, sized so the report shows the shrink converging.
    The edge list comes from the shared content-keyed artifact
    (plans/graph_edges.py) — a pruned parquet scan, not a re-derived
    basket self-join.

    Scale shape per round: ONE combinable degree count over the edge
    endpoints (a union is a plan concatenation, not a shuffle) and a
    LEFT SEMI join per endpoint against the kept-node set — no
    windows, no collected node lists. The edge list shrinks
    monotonically, so later rounds cost less. Each round's edge set is
    localCheckpoint'ed (the operators/pagerank.py discipline): without
    the lineage cut, round i's plan re-derives every earlier round for
    EACH of the per-round stats frames — O(rounds²) recomputation that
    measured 10x slower than the materialized form."""
    edges = copurchase_edges(spark, sf_dir, KCORE_SUPPORT)

    def stats(e: DataFrame, rnd: int) -> DataFrame:
        nodes = e.select(F.col("pa").alias("node")).unionAll(
            e.select(F.col("pb").alias("node"))
        )
        return nodes.distinct().agg(
            F.lit(rnd).alias("round"),
            F.count(F.lit(1)).alias("n_nodes"),
        ).crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))

    out = stats(edges, 0)
    cur = edges
    for i in range(1, KCORE_ROUNDS + 1):
        deg = (
            cur.select(F.col("pa").alias("node"))
            .unionAll(cur.select(F.col("pb").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= KCORE_K).select("node")
        cur = (
            cur.join(
                keep.select(F.col("node").alias("pa")), "pa", "left_semi"
            ).join(keep.select(F.col("node").alias("pb")), "pb", "left_semi")
        ).select("pa", "pb").localCheckpoint()
        out = out.unionAll(stats(cur, i))
    return out.select(
        "round",
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
    ).orderBy("round")
