"""Centroid-distance outlier detection over the embedding column
(SURVEY.md §2B embeddings tier, round 6).

The embedding-space data-quality gate: vectors far from their label's
centroid are mislabeled points, encoder failures, or genuine novelty —
exactly what a curation pipeline quarantines before training (the
embedding-space analogue of agg_outlier_mad's numeric rule). Fully
hash-checkable because centroids are plain per-dimension means — no
training, no driver-side linear algebra.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

OUT_TOP = 20  # outliers reported


@register(
    "emb_outliers",
    oracle=f"""
WITH expl AS (
    SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
    FROM (
        SELECT vec_id, label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    )
),
cent AS (
    SELECT label, i, ROUND(AVG(x), 6) AS c
    FROM expl GROUP BY label, i
),
dist AS (
    SELECT e.vec_id, e.label,
           ROUND(sqrt(SUM((e.x - c.c) * (e.x - c.c))), 6) AS d
    FROM expl e JOIN cent c ON e.label = c.label AND e.i = c.i
    GROUP BY e.vec_id, e.label
),
scored AS (
    SELECT vec_id, label, d,
           AVG(d) OVER (PARTITION BY label) AS mean_d,
           STDDEV_SAMP(d) OVER (PARTITION BY label) AS sd_d
    FROM dist
)
SELECT vec_id, label,
       ROUND(d, 4) AS dist,
       ROUND((d - mean_d) / sd_d, 4) AS z
FROM scored
ORDER BY ROUND((d - mean_d) / sd_d, 4) DESC, vec_id
LIMIT {OUT_TOP}
""",
    tags=("embeddings", "outliers", "quality"),
)
def emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{OUT_TOP} embedding outliers by z-scored Euclidean distance
    to their label centroid: per-dimension label means form the
    centroid, each vector's distance to it is z-scored against its
    label cohort, and the global worst offenders are reported — the
    mislabel/novelty quarantine report curation pipelines run before
    training.

    Scale shape: posexplode -> ONE combinable (label, dim) mean for
    centroids (labels x 64 rows — broadcast-side small), an equi-join
    back on (label, dim) feeding ONE combinable per-vector squared-
    distance sum, then per-label distance moments via a combinable
    groupBy broadcast back onto the distance frame (NOT a
    label-partitioned window: with ~10 labels a whole-frame window
    serializes corpus/|labels| rows into single tasks — r11 rewrite,
    identical values), and TakeOrderedAndProject for the global
    top-k. Nothing is all-pairs and no vector list ever collects.
    Centroids and distances are rounded before downstream stages, and
    the rank key is the ROUNDED z with vec_id tie-break, so the cut
    is engine-deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("i", "xf"),
    ).select("vec_id", "label", "i", F.col("xf").cast("double").alias("x"))
    cent = expl.groupBy("label", "i").agg(F.round(F.avg("x"), 6).alias("c"))
    dist = (
        expl.join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("x") - F.col("c")) ** 2)), 6
            ).alias("d")
        )
    )
    moments = dist.groupBy("label").agg(
        F.avg("d").alias("mean_d"), F.stddev_samp("d").alias("sd_d")
    )
    scored = dist.join(F.broadcast(moments), "label").select(
        "vec_id", "label", "d", "mean_d", "sd_d"
    )
    z = F.round((F.col("d") - F.col("mean_d")) / F.col("sd_d"), 4)
    return (
        scored.select(
            "vec_id", "label", F.round("d", 4).alias("dist"), z.alias("z")
        )
        .orderBy(F.desc("z"), "vec_id")
        .limit(OUT_TOP)
    )
