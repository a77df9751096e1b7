"""Graph analytics over the event stream: PageRank on the behavioral
transition graph (SURVEY.md §2B engine extensions; the reference —
SidetrekAI/target-iceberg, write-only — has no query surface).

Companion to `plans/analytics.py`'s `events_transitions` (the Markov
transition matrix): here the same per-user consecutive-event edges
feed the classic iterative-join algorithm, exercising the
driver-coordinated bounded-round pattern (`operators/pagerank.py`,
same family as the connected-components operator behind
`dedup_clusters`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# One PageRank round, parameterized by the previous rank CTE — the
# oracle unrolls the exact iteration the Spark operator runs.
_PR_ROUND = """
m{i} AS (
    SELECT norm.dst AS node, SUM(norm.frac * r{p}.rank) AS mass
    FROM norm JOIN r{p} ON norm.src = r{p}.node
    GROUP BY norm.dst
),
r{i} AS (
    SELECT nodes.node,
           (CAST(0.15 AS DOUBLE) / nn.n)
               + CAST(0.85 AS DOUBLE) * COALESCE(m{i}.mass, 0) AS rank
    FROM nodes CROSS JOIN nn LEFT JOIN m{i} ON nodes.node = m{i}.node
)"""

_PR_ORACLE = (
    """
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
nodes AS (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
outw AS (SELECT src, SUM(weight) AS out_w FROM edges GROUP BY src),
norm AS (
    SELECT e.src, e.dst, e.weight / o.out_w AS frac
    FROM edges e JOIN outw o USING (src)
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank
       FROM nodes CROSS JOIN nn),"""
    + ",".join(_PR_ROUND.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
SELECT node, ROUND(rank, 9) AS rank
FROM r3
ORDER BY node
"""
)


@register(
    "graph_pagerank",
    oracle=_PR_ORACLE,
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the behavioral transition graph: nodes are event
    types, edges are per-user consecutive-event transitions weighted by
    count, 3 power-method rounds at damping 0.85 (dangling mass
    dropped — see `operators/pagerank.py` for the documented
    semantics). The which-state-matters centrality pass of a journey
    model.

    Scale shape: edge extraction is ONE per-user window (lead over
    (ts, event_id)) + a combinable |types|²-bounded edge count; each
    PageRank round is one equi-join on src + one map-side-combinable
    sum on dst, rank state bounded by the node domain, lineage cut per
    round with localCheckpoint. Works unchanged when nodes are pages /
    domains / users (billions): nothing materializes more than the
    edge list and one rank table. Final ROUND(9) collapses the
    engines' sum-order ulp differences; constants are explicit double
    literals on both sides (Python's ``1 - 0.85`` is NOT the double
    ``0.15`` — see the operator docstring)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    edges = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )
    from target_iceberg_spark.operators.pagerank import pagerank

    ranks = pagerank(edges, iterations=3, damping=0.85, teleport=0.15)
    return ranks.select("node", F.round("rank", 9).alias("rank")).orderBy("node")
