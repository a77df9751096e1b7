"""HITS hubs-and-authorities over the supplier->part bipartite graph
(SURVEY.md §2B graph tier, round-6 post-window).

The fifth graph primitive (after PageRank, triangles, k-core, label
propagation): Kleinberg's HITS (JACM'99, public) on the directed
supply graph — a supplier is a good HUB if it ships many good parts,
a part a good AUTHORITY if good hubs ship it. Two full hub/authority
update rounds with L1 normalization at the end, so every intermediate
score stays an exact integer sum — the same cross-engine float
discipline as graph_modularity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

HITS_TOP = 15


@register(
    "graph_hits",
    oracle=f"""
WITH edges AS (
    SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
-- a0 = 1 for every part, so h1(s) = out-degree of s
h1 AS (
    SELECT s, COUNT(*) AS h FROM edges GROUP BY s
),
a1 AS (
    SELECT e.p, SUM(h1.h) AS a
    FROM edges e JOIN h1 ON e.s = h1.s
    GROUP BY e.p
),
h2 AS (
    SELECT e.s, SUM(a1.a) AS h
    FROM edges e JOIN a1 ON e.p = a1.p
    GROUP BY e.s
),
a2 AS (
    SELECT e.p, SUM(h2.h) AS a, COUNT(*) AS n_suppliers
    FROM edges e JOIN h2 ON e.s = h2.s
    GROUP BY e.p
),
tot AS (SELECT CAST(SUM(a) AS DOUBLE) AS t FROM a2)
SELECT a2.p AS part_key,
       CAST(a2.n_suppliers AS BIGINT) AS n_suppliers,
       ROUND(CAST(a2.a AS DOUBLE) / tot.t, 9) AS authority
FROM a2 CROSS JOIN tot
ORDER BY authority DESC, part_key
LIMIT {HITS_TOP}
""",
    tags=("graph", "hits", "ranking"),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HITS_TOP} authority parts after two HITS rounds on the
    distinct supplier->part edge set: a0=1, h1(s)=Σ a0 (= out-degree),
    a1(p)=Σ_(s->p) h1(s), h2(s)=Σ_(s->p) a1(p), a2(p)=Σ_(s->p) h2(s),
    reported L1-normalized. Fixed-round iteration is the declared-
    iteration discipline of graph_pagerank/kcore; authority mass is a
    sum of exact bigint products until the single final ratio
    (rounded at 9 — the denominators reach ~1e9, so 6 places would
    quantize away the ranking signal).

    Scale shape per round: ONE equi-join of the edge list against the
    node-keyed score frame (shuffle on supplier or part key — the
    score side is |nodes|-sized and broadcast-able) and ONE combinable
    SUM per node. No windows, no collected score vectors, and the
    normalizing total is a 1-row broadcast. The edge list is the
    distinct projection of two lineitem columns — at 100 TB it would
    be the same materialize-once artifact as plans/graph_edges.py."""
    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    ).localCheckpoint()
    h1 = edges.groupBy("s").agg(F.count(F.lit(1)).alias("h"))
    a1 = (
        edges.join(h1, "s")
        .groupBy("p")
        .agg(F.sum("h").alias("a"))
    )
    h2 = (
        edges.join(a1, "p")
        .groupBy("s")
        .agg(F.sum("a").alias("h"))
    )
    a2 = (
        edges.join(h2, "s")
        .groupBy("p")
        .agg(F.sum("h").alias("a"), F.count(F.lit(1)).alias("n_suppliers"))
    )
    tot = a2.agg(F.sum("a").cast("double").alias("t"))
    return (
        a2.crossJoin(F.broadcast(tot))
        .select(
            F.col("p").alias("part_key"),
            F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.round(F.col("a").cast("double") / F.col("t"), 9).alias(
                "authority"
            ),
        )
        .orderBy(F.desc("authority"), "part_key")
        .limit(HITS_TOP)
    )
