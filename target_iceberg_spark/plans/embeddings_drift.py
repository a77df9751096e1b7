"""Embedding-space drift between snapshots (SURVEY.md §2B embeddings
tier, round-6 post-window).

The vector counterpart to profile_drift_psi (numeric columns) and
agg_chi_square (categoricals): compare per-label centroids between two
corpus snapshots and report the cosine / L2 movement — the monitor a
retrieval or training pipeline runs to detect encoder regressions and
population shift before re-indexing. Snapshots are vec_id parity (the
deterministic split the fixtures support); in production they are two
table versions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "emb_drift_snapshots",
    oracle="""
WITH expl AS (
    SELECT vec_id % 2 AS snap, label, i, CAST(embedding[i] AS DOUBLE) AS x
    FROM (
        SELECT vec_id, label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    )
),
cent AS (
    SELECT snap, label, i, ROUND(AVG(x), 6) AS c,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM expl GROUP BY snap, label, i
),
paired AS (
    SELECT a.label, a.i, a.c AS ca, b.c AS cb, a.n AS n_a, b.n AS n_b
    FROM cent a JOIN cent b ON a.label = b.label AND a.i = b.i
    WHERE a.snap = 0 AND b.snap = 1
)
SELECT label,
       MAX(n_a) AS n_a, MAX(n_b) AS n_b,
       ROUND(SUM(ca * cb)
             / (sqrt(SUM(ca * ca)) * sqrt(SUM(cb * cb))), 6) AS cos_sim,
       ROUND(sqrt(SUM((ca - cb) * (ca - cb))), 4) AS l2_dist
FROM paired
GROUP BY label
ORDER BY label
""",
    tags=("embeddings", "drift", "monitoring"),
)
def emb_drift_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between two embedding snapshots
    (vec_id parity as the deterministic snapshot split): cosine
    similarity and L2 distance between each label's snapshot-A and
    snapshot-B centroids, with both cohort sizes — cos_sim near 1
    means the population is stable; a label whose centroid swings is
    where re-indexing / re-training attention goes first.

    Scale shape: ONE combinable (snapshot, label, dim) mean is the
    only full-data stage (posexplode feeds map-side partial
    aggregation; shuffle volume is 2 x labels x 64 rows regardless of
    corpus size); the snapshot pairing is a self-join on that
    tiny centroid frame and the drift arithmetic is one grouped
    aggregation over it. Centroids are rounded before the pairing so
    cross-engine sum-order differences collapse; cosine/L2 over the
    rounded centroids then round at the output boundary."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        (F.col("vec_id") % 2).alias("snap"),
        "label",
        F.posexplode("embedding").alias("i", "xf"),
    ).select("snap", "label", "i", F.col("xf").cast("double").alias("x"))
    # every vector contributes exactly one x per dimension, so the
    # per-(snap, label, i) count IS the cohort size
    cent = expl.groupBy("snap", "label", "i").agg(
        F.round(F.avg("x"), 6).alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = cent.where(F.col("snap") == 0).alias("a")
    b = cent.where(F.col("snap") == 1).alias("b")
    paired = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.i") == F.col("b.i")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.c").alias("ca"),
        F.col("b.c").alias("cb"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    )
    return (
        paired.groupBy("label")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.round(
                F.sum(F.col("ca") * F.col("cb"))
                / (
                    F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                    * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
                ),
                6,
            ).alias("cos_sim"),
            F.round(
                F.sqrt(F.sum((F.col("ca") - F.col("cb")) ** 2)), 4
            ).alias("l2_dist"),
        )
        .orderBy("label")
    )
