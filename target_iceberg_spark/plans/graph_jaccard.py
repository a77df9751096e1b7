"""Neighborhood-Jaccard link prediction over the co-purchase graph
(SURVEY.md §2B graph tier, round 10).

Completes the link-prediction triad: common-neighbor COUNT
(graph_link_prediction) over-ranks high-degree pairs, Adamic-Adar
(graph_adamic_adar) down-weights hub WITNESSES, and Jaccard
|N(a) n N(b)| / |N(a) u N(b)| (Liben-Nowell & Kleinberg CIKM 2003's
baseline panel, public) normalizes by the ENDPOINTS' degrees — the
right rank when one side is a popular part that co-occurs with
everything. Union size needs no second join: |u| = d_a + d_b - cn.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.graph_edges import copurchase_edges
from target_iceberg_spark.plans.registry import register

NJ_SUPPORT = 2  # co-purchase support threshold (shared graph tier)
NJ_DEG_CAP = 50  # wedge-center degree cap (hub mitigation, as AA)
NJ_TOP = 15


@register(
    "graph_neighbor_jaccard",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT pa, pb FROM pairs
    GROUP BY pa, pb HAVING COUNT(*) >= {NJ_SUPPORT}
),
adj AS (
    SELECT pa AS node, pb AS nbr FROM edges
    UNION ALL
    SELECT pb, pa FROM edges
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY node
),
capped AS (
    SELECT a.node, a.nbr
    FROM adj a JOIN deg dc ON a.nbr = dc.node
    WHERE dc.d <= {NJ_DEG_CAP}
),
wedges AS (
    SELECT x.node AS a, y.node AS b, CAST(COUNT(*) AS BIGINT) AS cn
    FROM capped x JOIN capped y
      ON x.nbr = y.nbr AND x.node < y.node
    GROUP BY x.node, y.node
),
cand AS (
    SELECT w.a, w.b, w.cn, da.d AS da, db.d AS db
    FROM wedges w
    JOIN deg da ON w.a = da.node
    JOIN deg db ON w.b = db.node
    LEFT JOIN edges e ON w.a = e.pa AND w.b = e.pb
    WHERE e.pa IS NULL
)
SELECT a AS part_a, b AS part_b, cn AS common_nbrs,
       da + db - cn AS union_nbrs,
       ROUND(cn / CAST(da + db - cn AS DOUBLE), 6) AS jaccard
FROM cand
ORDER BY jaccard DESC, part_a, part_b
LIMIT {NJ_TOP}
""",
    tags=("graph", "linkprediction", "mining"),
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{NJ_TOP} predicted links by neighborhood Jaccard: wedge
    count through {NJ_DEG_CAP}-capped centers gives the intersection,
    the two endpoint degrees give the union in closed form
    (d_a + d_b - cn), existing edges are anti-joined out.

    Scale shape: identical to graph_adamic_adar — one equi-join
    through the wedge center (never all-pairs), the degree table is a
    combinable count broadcast onto both endpoints, and the final
    rank is TakeOrdered({NJ_TOP}). The degree cap bounds per-center
    wedge fan-out at {NJ_DEG_CAP} choose 2 regardless of corpus
    size."""
    edges = copurchase_edges(spark, sf_dir, support=NJ_SUPPORT)
    adj = edges.select(F.col("pa").alias("node"), F.col("pb").alias("nbr")).unionAll(
        edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
    )
    # localCheckpoint: `deg` (node-sized combinable count) feeds the
    # capped-center filter AND both endpoint broadcasts — each consumer
    # re-ran the artifact scan + adjacency groupBy without the cut.
    deg = (
        adj.groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint()
    )
    # localCheckpoint: `capped` is BOTH sides of the wedge self-join —
    # without it the adjacency/degree join executes twice (guide §2.4).
    capped = (
        adj.join(deg.withColumnRenamed("node", "nbr"), "nbr")
        .where(F.col("d") <= NJ_DEG_CAP)
        .select("node", "nbr")
    ).localCheckpoint()
    x, y = capped.alias("x"), capped.alias("y")
    wedges = (
        x.join(y, (F.col("x.nbr") == F.col("y.nbr")) & (F.col("x.node") < F.col("y.node")))
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    cand = (
        wedges.join(
            F.broadcast(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da")),
            "a",
        )
        .join(
            F.broadcast(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db")),
            "b",
        )
        .join(
            edges,
            (F.col("a") == F.col("pa")) & (F.col("b") == F.col("pb")),
            "left_anti",
        )
    )
    return (
        cand.select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            F.col("cn").alias("common_nbrs"),
            (F.col("da") + F.col("db") - F.col("cn")).alias("union_nbrs"),
            F.round(
                F.col("cn") / (F.col("da") + F.col("db") - F.col("cn")).cast("double"), 6
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(NJ_TOP)
    )
