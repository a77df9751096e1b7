"""Synchronized min-label propagation over the co-purchase graph
(SURVEY.md §2B graph tier, round 6).

The fourth graph primitive next to PageRank, triangles, and k-core:
every node starts labeled with its own id and each round adopts the
minimum label in its closed neighborhood — the HashMin / label-
propagation scheme (Kang et al. PEGASUS, ICDM'09, public) that
underlies connected components at scale (operators/components.py runs
the same discipline over dedup candidate pairs; this is the registered
graph-tier form with a per-round convergence report the oracle can
hash-check).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

LPA_ROUNDS = 3
LPA_SUPPORT = 2  # co-purchase support threshold (same as triangles/kcore)


def _lpa_round_sql(i: int) -> str:
    prev = f"l{i - 1}"
    return f"""
l{i} AS MATERIALIZED (
    SELECT node, MIN(lbl) AS lbl FROM (
        SELECT node, lbl FROM {prev}
        UNION ALL
        SELECT e.pa AS node, p.lbl FROM edges e JOIN {prev} p ON e.pb = p.node
        UNION ALL
        SELECT e.pb AS node, p.lbl FROM edges e JOIN {prev} p ON e.pa = p.node
    ) GROUP BY node
)"""


@register(
    "graph_label_propagation",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT pa, pb FROM pairs
    GROUP BY pa, pb HAVING COUNT(*) >= {LPA_SUPPORT}
),
l0 AS MATERIALIZED (
    SELECT node, node AS lbl
    FROM (SELECT pa AS node FROM edges UNION SELECT pb FROM edges)
),
{",".join(_lpa_round_sql(i) for i in range(1, LPA_ROUNDS + 1))}
SELECT * FROM (
    {" UNION ALL ".join(f'''
    SELECT {i} AS round,
           CAST((SELECT COUNT(DISTINCT lbl) FROM l{i}) AS BIGINT)
               AS n_labels,
           CAST((SELECT MAX(sz) FROM (
               SELECT COUNT(*) AS sz FROM l{i} GROUP BY lbl)) AS BIGINT)
               AS largest''' for i in range(0, LPA_ROUNDS + 1))}
)
ORDER BY round
""",
    tags=("graph", "components", "communities"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{LPA_ROUNDS} rounds of synchronized min-label propagation over
    the co-purchase graph (edges = part pairs bought together in >=
    {LPA_SUPPORT} orders): every node starts as its own label and each
    round takes the minimum label over itself and its neighbors,
    reporting (distinct labels, largest block) after every round — the
    convergence curve an operator reads to size communities and decide
    whether more rounds are worth the shuffles. Fixed-round iteration
    is the same declared-iteration discipline as graph_pagerank /
    graph_kcore (labels after k rounds = min node id within k hops; the
    fixpoint is connected components).

    Scale shape per round: two equi-joins propagate labels across
    edges (each keyed on a node id — broadcast-able when the frontier
    shrinks, AQE's call) and ONE combinable MIN per node folds the
    neighborhood; the per-round report is a distinct count plus a
    grouped count over the label frame. Each round's label frame is
    localCheckpoint'ed (the graph_kcore lineage-cut discipline —
    without it round i re-derives every earlier round per stats
    frame). No windows, no collected node lists."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= LPA_SUPPORT)
        .select("pa", "pb")
    ).localCheckpoint()

    def stats(lbls: DataFrame, rnd: int) -> DataFrame:
        sizes = lbls.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
        return sizes.agg(
            F.lit(rnd).alias("round"),
            F.count(F.lit(1)).cast("bigint").alias("n_labels"),
            F.max("sz").cast("bigint").alias("largest"),
        )

    labels = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    ).localCheckpoint()
    out = stats(labels, 0)
    for i in range(1, LPA_ROUNDS + 1):
        via_b = edges.join(
            labels.withColumnRenamed("node", "pb"), "pb"
        ).select(F.col("pa").alias("node"), "lbl")
        via_a = edges.join(
            labels.withColumnRenamed("node", "pa"), "pa"
        ).select(F.col("pb").alias("node"), "lbl")
        labels = (
            labels.select("node", "lbl")
            .unionAll(via_b)
            .unionAll(via_a)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        out = out.unionAll(stats(labels, i))
    return out.orderBy("round")
