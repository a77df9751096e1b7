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

from target_iceberg_spark.plans.graph_edges import copurchase_edges
from target_iceberg_spark.plans.registry import register

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


# Shared CTE prefix: co-purchase edges + LPA rounds l0..l{LPA_ROUNDS}.
# Both the convergence-report oracle and the modularity oracle build on
# the IDENTICAL label chain so the two queries can never drift apart.
_LPA_CTE_PREFIX = f"""
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
{",".join(_lpa_round_sql(i) for i in range(1, LPA_ROUNDS + 1))}"""


def co_purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-thresholded co-purchase edge list (pa < pb), served
    from the shared content-keyed parquet artifact
    (plans/graph_edges.py) — every consumer iterates or
    multi-references the edge set, and the artifact turns each
    reference into a pruned parquet scan instead of re-deriving the
    O(basket^2) pair join."""
    return copurchase_edges(spark, sf_dir, LPA_SUPPORT)


def lpa_label_frames(edges: DataFrame, rounds: int) -> list[DataFrame]:
    """[l0, l1, ..., l_rounds]: synchronized min-label frames, each
    localCheckpoint'ed (graph_kcore lineage-cut discipline)."""
    labels = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    ).localCheckpoint()
    frames = [labels]
    for _ in range(rounds):
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
        frames.append(labels)
    return frames


@register(
    "graph_label_propagation",
    oracle=f"""
{_LPA_CTE_PREFIX}
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
    edges = co_purchase_edges(spark, sf_dir)

    def stats(lbls: DataFrame, rnd: int) -> DataFrame:
        sizes = lbls.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
        return sizes.agg(
            F.lit(rnd).alias("round"),
            F.count(F.lit(1)).cast("bigint").alias("n_labels"),
            F.max("sz").cast("bigint").alias("largest"),
        )

    frames = lpa_label_frames(edges, LPA_ROUNDS)
    out = stats(frames[0], 0)
    for i in range(1, LPA_ROUNDS + 1):
        out = out.unionAll(stats(frames[i], i))
    return out.orderBy("round")


@register(
    "graph_modularity",
    oracle=f"""
{_LPA_CTE_PREFIX},
lab AS (SELECT node, lbl FROM l{LPA_ROUNDS}),
deg AS (
    SELECT node, CAST(COUNT(*) AS DOUBLE) AS deg
    FROM (SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges)
    GROUP BY node
),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM edges),
intra AS (
    SELECT la.lbl, CAST(COUNT(*) AS DOUBLE) AS e_c
    FROM edges e
    JOIN lab la ON e.pa = la.node
    JOIN lab lb ON e.pb = lb.node
    WHERE la.lbl = lb.lbl
    GROUP BY la.lbl
),
dsum AS (
    SELECT lab.lbl, SUM(deg.deg) AS d_c
    FROM deg JOIN lab ON deg.node = lab.node
    GROUP BY lab.lbl
)
SELECT CAST(m.m AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM lab) AS BIGINT) AS n_nodes,
       CAST(COUNT(*) AS BIGINT) AS n_communities,
       ROUND(SUM(COALESCE(intra.e_c, 0) / m.m
                 - (dsum.d_c / (2 * m.m)) * (dsum.d_c / (2 * m.m))), 4)
           AS modularity
FROM dsum
LEFT JOIN intra ON dsum.lbl = intra.lbl
CROSS JOIN m
GROUP BY m.m
""",
    tags=("graph", "communities", "quality"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q = sum_c(e_c/m - (d_c/2m)^2) of the
    partition produced by {LPA_ROUNDS} rounds of min-label propagation
    over the co-purchase graph — the standard score (Newman & Girvan
    2004, public) that says whether the communities LPA found are
    denser than a random graph with the same degrees (Q>0) or
    artifacts. Sharing `_LPA_CTE_PREFIX` / `lpa_label_frames` with
    graph_label_propagation guarantees this scores EXACTLY the
    partition that query reports, not a drifted re-derivation.

    Scale shape: degrees and intra-community edge counts are
    combinable aggregations over the edge list joined twice to the
    node-keyed label frame (equi-joins on node id); the per-community
    frame is communities-sized, folded to ONE row. The only doubles
    are exact-integer ratios, summed per community and rounded at the
    end — the established cross-engine float discipline."""
    edges = co_purchase_edges(spark, sf_dir)
    lab = lpa_label_frames(edges, LPA_ROUNDS)[-1]
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
    )
    m = edges.agg(F.count(F.lit(1)).cast("double").alias("m"))
    intra = (
        edges.join(
            lab.select(F.col("node").alias("pa"), F.col("lbl").alias("la")),
            "pa",
        )
        .join(
            lab.select(F.col("node").alias("pb"), F.col("lbl").alias("lb")),
            "pb",
        )
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("double").alias("e_c"))
    )
    dsum = (
        deg.join(lab, "node")
        .groupBy("lbl")
        .agg(F.sum("deg").alias("d_c"))
    )
    n_nodes = lab.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    contrib = F.coalesce(F.col("e_c"), F.lit(0.0)) / F.col("m") - (
        F.col("d_c") / (2 * F.col("m"))
    ) * (F.col("d_c") / (2 * F.col("m")))
    return (
        dsum.join(intra, "lbl", "left")
        .crossJoin(F.broadcast(m))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_communities"),
            F.round(F.sum(contrib), 4).alias("modularity"),
        )
        .crossJoin(F.broadcast(n_nodes))
        .select(
            F.col("m").cast("bigint").alias("n_edges"),
            "n_nodes",
            "n_communities",
            "modularity",
        )
    )
