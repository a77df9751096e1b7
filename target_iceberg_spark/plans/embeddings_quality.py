"""Cluster-quality audit for the embedding tier (SURVEY.md §2B,
round-6 post-window).

emb_kmeans fits the clustering; this scores it: the simplified
(centroid-based) silhouette — s_i = (b_i − a_i) / max(a_i, b_i) with
a_i the distance to the OWN centroid and b_i the distance to the
nearest OTHER centroid (Rousseeuw 1987; the centroid-based
simplification is the standard O(N·K) form, Hruschka et al. 2004,
public — exact silhouette is O(N²) pairwise and never runs at corpus
scale). The k-means chain here is IDENTICAL to emb_kmeans (same
first-K seeding, same two Lloyd steps, same round-before-argmin
discipline, constants imported) so the audit scores exactly the
partition that query reports.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.embeddings import KMEANS_K
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# The same two-Lloyd-step chain as emb_kmeans's oracle, extended with
# the second-nearest centroid. Kept in lockstep via KMEANS_K.
_KMEANS_CTE = f"""
pos AS (
    SELECT vec_id, pos, embedding[pos] AS val
    FROM (SELECT vec_id, embedding,
                 unnest(range(1, len(embedding) + 1)) AS pos
          FROM embeddings)
),
c1 AS (
    SELECT vec_id AS cid, pos, val AS cval FROM pos WHERE vec_id < {KMEANS_K}
),
d1 AS (
    SELECT p.vec_id, c.cid,
           ROUND(SUM((p.val - c.cval) * (p.val - c.cval)), 6) AS d2
    FROM pos p JOIN c1 c ON p.pos = c.pos
    GROUP BY p.vec_id, c.cid
),
m1 AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d1
    ) WHERE rn = 1
),
c2 AS (
    SELECT m1.cid, p.pos, AVG(p.val) AS cval
    FROM pos p JOIN m1 ON p.vec_id = m1.vec_id
    GROUP BY m1.cid, p.pos
),
d2t AS (
    SELECT p.vec_id, c.cid,
           ROUND(SUM((p.val - c.cval) * (p.val - c.cval)), 6) AS d2
    FROM pos p JOIN c2 c ON p.pos = c.pos
    GROUP BY p.vec_id, c.cid
)"""


@register(
    "emb_silhouette",
    oracle=f"""
WITH {_KMEANS_CTE},
nearest2 AS (
    SELECT vec_id,
           MAX(CASE WHEN rn = 1 THEN cid END) AS own_cid,
           MAX(CASE WHEN rn = 1 THEN d2 END) AS a2,
           MAX(CASE WHEN rn = 2 THEN d2 END) AS b2
    FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d2t
    ) WHERE rn <= 2
    GROUP BY vec_id
),
scored AS (
    SELECT vec_id, own_cid,
           CASE WHEN GREATEST(sqrt(a2), sqrt(b2)) = 0 THEN 0.0
                ELSE ROUND((sqrt(b2) - sqrt(a2))
                           / GREATEST(sqrt(a2), sqrt(b2)), 6) END AS s
    FROM nearest2
)
SELECT own_cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(AVG(s), 4) AS mean_silhouette,
       ROUND(MIN(s), 4) AS worst_silhouette
FROM scored
GROUP BY own_cid
ORDER BY cluster_id
""",
    tags=("embeddings", "clustering", "quality"),
)
def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette of the emb_kmeans partition:
    for every vector, a = distance to its own (nearest) refit centroid
    and b = distance to the second-nearest; s = (b−a)/max(a,b) in
    [−1, 1], averaged per cluster with the worst point alongside — the
    report that tells an embedding-pipeline operator which clusters
    are coherent domains and which are quantizer artifacts before IVF
    posting lists or SemDeDup blocks are built on them.

    Scale shape: identical to emb_kmeans per iteration (broadcast
    K-row centroid table, one codegen fold per vector, combinable
    refit) — the silhouette adds ZERO new shuffles: both nearest
    distances come from ONE sort_array(collect_list) over the K
    bounded per-vector scores (K={KMEANS_K} structs per vector, never
    a window), and the per-cluster rollup is combinable. Distances are
    rounded at 6 before ranking (the emb_kmeans discipline), s at 6,
    the means at 4 — sqrt is IEEE-exact so both engines see identical
    summands."""
    # fanout A/B'd round 13 and REJECTED (off 1.51 s -> on 1.93 s,
    # 1.28x): the N x K fold stages here are short relative to the
    # many broadcast builds/joins, so the extra exchanges are loss.
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select("vec_id", F.posexplode("embedding").alias("p", "v"))

    def to_arrays(cent_pos: DataFrame) -> DataFrame:
        return cent_pos.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )

    def score(cent_arr: DataFrame) -> DataFrame:
        d2 = F.round(
            F.aggregate(
                F.zip_with("embedding", "cvec", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        return (
            emb.select("vec_id", "embedding")
            .crossJoin(F.broadcast(cent_arr))
            .select("vec_id", "cid", d2.alias("d2"))
        )

    seeds = emb.where(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"),
        F.posexplode("embedding").alias("p", "cv"),
    )
    a1 = score(to_arrays(seeds)).groupBy("vec_id").agg(
        F.min(F.struct("d2", "cid")).alias("_m")
    ).select("vec_id", F.col("_m.cid").alias("cid"))
    refit = (
        pos.join(a1, "vec_id")
        .groupBy("cid", "p")
        .agg(F.avg("v").alias("cv"))
    )
    # both nearest centroids from ONE bounded collect per vector
    two = (
        score(to_arrays(refit))
        .groupBy("vec_id")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("d2", "cid"))), 1, 2
            ).alias("nn")
        )
        .select(
            "vec_id",
            F.col("nn")[0]["cid"].alias("own_cid"),
            F.col("nn")[0]["d2"].alias("a2"),
            F.col("nn")[1]["d2"].alias("b2"),
        )
    )
    denom = F.greatest(F.sqrt("a2"), F.sqrt("b2"))
    s = F.when(denom == 0, F.lit(0.0)).otherwise(
        F.round((F.sqrt("b2") - F.sqrt("a2")) / denom, 6)
    )
    return (
        two.select("own_cid", s.alias("s"))
        .groupBy(F.col("own_cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.avg("s"), 4).alias("mean_silhouette"),
            F.round(F.min("s"), 4).alias("worst_silhouette"),
        )
        .orderBy("cluster_id")
    )
