"""Semantic curriculum ordering (SURVEY.md §2B curation tier,
round 10).

Training-data ORDER matters: In-Context Pretraining (Shi et al. 2024,
public) shows grouping semantically related documents into the same
context window improves downstream in-context learning, and the
scalable recipe is cluster-then-chain — route every document to a
coarse cluster, emit cluster-contiguous streams ordered
centroid-out. This operator is that deterministic global order:
sort by (cluster, distance-to-centroid, id) so related documents are
adjacent and each cluster reads coherent-core-first.

Clustering reuses the emb_kmeans convention (centroids = first K
vectors, distances rounded to 6 before the argmin) so the assignment
is engine-portable with no RNG.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ORDER_K = 8  # coarse clusters (curriculum stream count)
ORDER_HEAD = 40  # checked prefix of the global curriculum


@register(
    "curation_semantic_order",
    oracle=f"""
WITH pos AS (
    SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val
    FROM (SELECT vec_id, embedding,
                 unnest(range(1, len(embedding) + 1)) AS pos
          FROM embeddings)
),
cent AS (
    SELECT vec_id AS cid, pos, val AS cval FROM pos WHERE vec_id < {ORDER_K}
),
dist AS (
    SELECT p.vec_id, c.cid,
           ROUND(SUM((p.val - c.cval) * (p.val - c.cval)), 6) AS d2
    FROM pos p JOIN cent c ON p.pos = c.pos
    GROUP BY p.vec_id, c.cid
),
assigned AS (
    SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM dist)
    WHERE rn = 1
),
head AS (
    SELECT vec_id, cid, d2 FROM assigned
    ORDER BY cid, d2, vec_id LIMIT {ORDER_HEAD}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid, d2, vec_id) AS BIGINT)
           AS curriculum_rank,
       vec_id, cid AS cluster, d2 AS dist2
FROM head
ORDER BY curriculum_rank
""",
    tags=("curation", "ordering", "embeddings", "curriculum"),
)
def curation_semantic_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First {ORDER_HEAD} rows of the semantic curriculum: documents
    routed to {ORDER_K} fixed-seed clusters (first-K centroids,
    distances rounded to 6 before the argmin), globally ordered by
    (cluster, distance, id) so each training stream reads a cluster's
    coherent core first — the cluster-then-chain approximation of
    In-Context Pretraining's related-docs-adjacent layout.

    Scale shape: the centroid table is K x dims — broadcast; the
    assignment is one codegen distance fold per vector plus a
    vec-partitioned argmin window over K rows; the global rank only
    needs the checked {ORDER_HEAD}-row prefix, which TakeOrdered
    serves without a full sort (at production scale the full
    curriculum would WRITE sorted-within-cluster-bucket files —
    repartitionByRange(cluster, d2) — rather than materialize one
    global rank)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select("vec_id", F.posexplode("embedding").alias("pos", "_vf")).select(
        "vec_id", "pos", F.col("_vf").cast("double").alias("val")
    )
    cent = pos.where(F.col("vec_id") < ORDER_K).select(
        F.col("vec_id").alias("cid"), "pos", F.col("val").alias("cval")
    )
    dist = (
        pos.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.round(
                F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))),
                6,
            ).alias("d2")
        )
    )
    assigned = (
        dist.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id").orderBy("d2", "cid")),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", "cid", "d2")
    )
    head = assigned.orderBy("cid", "d2", "vec_id").limit(ORDER_HEAD)
    return (
        head.select(
            F.row_number()
            .over(Window.orderBy("cid", "d2", "vec_id"))
            .cast("bigint")
            .alias("curriculum_rank"),
            "vec_id",
            F.col("cid").alias("cluster"),
            F.col("d2").alias("dist2"),
        )
        .orderBy("curriculum_rank")
    )
