"""Personalized PageRank from a seed state (SURVEY.md §2B graph tier,
round 10).

graph_pagerank answers "which states matter globally"; the
recommendation/proximity question is "which states matter FROM
HERE" — Personalized PageRank (Page et al. 1999 §6; Jeh & Widom's
scaled personalization, WWW 2003 — public): teleport returns to a
seed distribution instead of uniform, so rank mass concentrates in
the seed's neighborhood. Same power method, same operator
(`operators/pagerank.py`, now with a restart vector); the oracle
unrolls the identical iterations with the seed teleport.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.pagerank import pagerank
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PPR_SEED = "signup"  # restart distribution: all mass on this state
PPR_ITERS = 3
PPR_DAMP = 0.85
# Explicit double literal, NOT 1 - PPR_DAMP: Python evaluates 1 - 0.85
# to 0.15000000000000002 while the oracle's literal 0.15 is the nearest
# double to 0.15 — both engines must run identical IEEE arithmetic
# (operators/pagerank.py module docstring).
PPR_TELEPORT = 0.15

# Oracle literals are DERIVED from the module constants so a constant
# change cannot silently desynchronize plan and oracle (ADVICE r10).
_ROUND = f"""
m{{i}} AS (
    SELECT norm.dst AS node, SUM(norm.frac * r{{p}}.rank) AS mass
    FROM norm JOIN r{{p}} ON norm.src = r{{p}}.node
    GROUP BY norm.dst
),
r{{i}} AS (
    SELECT nodes.node,
           CAST({PPR_TELEPORT!r} AS DOUBLE) * nodes.r
               + CAST({PPR_DAMP!r} AS DOUBLE) * COALESCE(m{{i}}.mass, 0) AS rank
    FROM nodes LEFT JOIN m{{i}} ON nodes.node = m{{i}}.node
)"""

_PPR_ORACLE = (
    f"""
WITH seq AS (
    SELECT event_type AS src,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
    FROM events
),
edges AS (
    SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS weight
    FROM seq WHERE dst IS NOT NULL
    GROUP BY src, dst
),
rawnodes AS (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
nodes AS (
    SELECT node,
           CASE WHEN node = '{PPR_SEED}' THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS r
    FROM rawnodes
),
outw AS (SELECT src, SUM(weight) AS out_w FROM edges GROUP BY src),
norm AS (
    SELECT e.src, e.dst, e.weight / o.out_w AS frac
    FROM edges e JOIN outw o USING (src)
),
r0 AS (SELECT node, r AS rank FROM nodes),"""
    + ",".join(_ROUND.format(i=i, p=i - 1) for i in range(1, PPR_ITERS + 1))
    + f"""
SELECT node, ROUND(rank, 9) AS ppr
FROM r{PPR_ITERS}
ORDER BY ppr DESC, node
"""
)


@register(
    "graph_ppr",
    oracle=_PPR_ORACLE,
    tags=("graph", "iterative", "recommendation"),
)
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the behavioral transition graph with
    all restart mass on '{PPR_SEED}': {PPR_ITERS} power rounds at
    damping {PPR_DAMP}, teleport returning to the seed instead of
    uniform — "which states are reachable-important from signup", the
    seed-proximity rank behind also-viewed recommendations.

    Scale shape: identical to graph_pagerank — the normalized edge
    table materializes once (localCheckpoint) and each round is one
    equi-join + combinable aggregate over |node| rows; the restart
    vector adds one broadcast-sized column, no extra pass. Dangling
    mass drops (documented operator semantics, same as the uniform
    variant), which for PPR concentrates rather than redistributes —
    the conservative choice for proximity ranking."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    )
    edges = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    restart = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select(
            "node",
            F.when(F.col("node") == PPR_SEED, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("r"),
        )
    )
    ranks = pagerank(
        edges,
        iterations=PPR_ITERS,
        damping=PPR_DAMP,
        teleport=PPR_TELEPORT,
        restart=restart,
    )
    return ranks.select("node", F.round("rank", 9).alias("ppr")).orderBy(
        F.desc("ppr"), "node"
    )
