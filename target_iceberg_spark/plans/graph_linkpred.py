"""Common-neighbor link prediction over the co-purchase graph
(SURVEY.md §2B graph tier, round-6 post-window).

The recommendation primitive the co-purchase tier was missing: rank
NOT-yet-connected part pairs by neighborhood Jaccard overlap
(Liben-Nowell & Kleinberg CIKM'03, public) — "parts bought alongside
the same other parts" — the classic candidate generator for
you-may-also-like slates and substitute detection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.graph_edges import copurchase_edges
from target_iceberg_spark.plans.registry import register

LP_SUPPORT = 2  # co-purchase support threshold (same as triangles/kcore)
LP_DEG_CAP = 50  # wedge-center degree cap (hub mitigation)
LP_TOP = 15


@register(
    "graph_link_prediction",
    oracle=f"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT pa, pb FROM pairs
    GROUP BY pa, pb HAVING COUNT(*) >= {LP_SUPPORT}
),
adj AS (
    SELECT pa AS node, pb AS nbr FROM edges
    UNION ALL
    SELECT pb, pa FROM edges
),
deg AS (
    SELECT node, COUNT(*) AS d FROM adj GROUP BY node
),
centers AS (
    SELECT node FROM deg WHERE d <= {LP_DEG_CAP}
),
wedges AS (
    SELECT x.node AS a, y.node AS b, COUNT(*) AS cn
    FROM adj x JOIN adj y
      ON x.nbr = y.nbr AND x.node < y.node
    JOIN centers c ON x.nbr = c.node
    GROUP BY x.node, y.node
),
cand AS (
    SELECT w.a, w.b, w.cn
    FROM wedges w
    LEFT JOIN edges e ON w.a = e.pa AND w.b = e.pb
    WHERE e.pa IS NULL
)
SELECT c.a AS part_a, c.b AS part_b,
       CAST(c.cn AS BIGINT) AS common_nbrs,
       ROUND(CAST(c.cn AS DOUBLE) / (da.d + db.d - c.cn), 6) AS jaccard
FROM cand c
JOIN deg da ON c.a = da.node
JOIN deg db ON c.b = db.node
ORDER BY jaccard DESC, part_a, part_b
LIMIT {LP_TOP}
""",
    tags=("graph", "linkprediction", "mining"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{LP_TOP} predicted co-purchase links: part pairs NOT
    directly connected, ranked by the Jaccard overlap of their
    neighborhoods |N(a)∩N(b)| / |N(a)∪N(b)| — common neighbors are
    counted by joining the adjacency list with itself THROUGH the
    shared neighbor (one equi-join on the wedge center), never by
    materializing neighbor sets per node.

    Scale shape: the standard wedge-enumeration discipline — wedge
    volume through a center of degree d is d², so centers above the
    {LP_DEG_CAP}-degree cap are excluded from wedge generation (hub
    mitigation, mirrored exactly in the oracle; their edges still
    count toward the Jaccard DENOMINATOR via the uncapped degree
    table). Existing edges are removed with one equi-join (the
    canonical a<b orientation makes it a single lookup, no OR), both
    degree lookups join on a node key, and TakeOrderedAndProject
    finishes the top-k. Jaccard is a ratio of exact counts — rounding
    at 6 is boundary-safe; ties break on the part ids."""
    edges = copurchase_edges(spark, sf_dir, LP_SUPPORT).localCheckpoint()
    adj = edges.select(
        F.col("pa").alias("node"), F.col("pb").alias("nbr")
    ).unionAll(edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr")))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    centers = deg.where(F.col("d") <= LP_DEG_CAP).select("node")
    # prune hub centers BEFORE the wedge join (the join equates the
    # two nbr sides, so one semi filter bounds both)
    capped = adj.join(
        centers.select(F.col("node").alias("nbr")), "nbr", "left_semi"
    )
    x, y = capped.alias("x"), capped.alias("y")
    wedges = (
        x.join(
            y,
            (F.col("x.nbr") == F.col("y.nbr"))
            & (F.col("x.node") < F.col("y.node")),
        )
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    cand = wedges.join(
        edges.select(F.col("pa").alias("a"), F.col("pb").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            F.col("cn").cast("bigint").alias("common_nbrs"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(LP_TOP)
    )
