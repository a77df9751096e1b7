"""SemDeDup-style semantic deduplication (SURVEY.md §2B dedup north
star, round-5 post-window).

The published semantic-dedup recipe for web-scale corpora (Abbas et
al. 2023 "SemDeDup", public): cluster embeddings with a coarse k-means
quantizer, then search for near-duplicate pairs ONLY WITHIN each
cluster — the cluster assignment is the blocking key that bounds the
quadratic, exactly the role LSH bands play in dedup_minhash and sign
buckets in dedup_embedding. This third blocking strategy is the one
that follows semantic geometry rather than lexical overlap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SEM_K = 16  # coarse clusters; centroids = first K vectors (see below)
SEM_TAU = 0.3  # within-cluster cosine >= tau => semantic duplicate
SEM_SALT = 8  # pair-join sub-buckets per cluster (parallelism valve)


@register(
    "dedup_semantic",
    oracle=f"""
WITH c AS (
    SELECT vec_id AS cid, embedding AS cemb FROM embeddings
    WHERE vec_id < {SEM_K}
),
d AS (
    SELECT e.vec_id, c.cid,
           ROUND(list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> (CAST(e.embedding[i] AS DOUBLE)
                       - CAST(c.cemb[i] AS DOUBLE))
                      * (CAST(e.embedding[i] AS DOUBLE)
                         - CAST(c.cemb[i] AS DOUBLE)))), 6) AS d2
    FROM embeddings e, c
),
assigned AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d
    ) WHERE rn = 1
),
unit AS (
    SELECT s.vec_id, s.cid,
           list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) / e.nrm) AS u
    FROM (SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS nrm
          FROM embeddings) e
    JOIN assigned s USING (vec_id)
),
pairs AS (
    SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b
    FROM unit a JOIN unit b
      ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE ROUND(list_sum(list_transform(range(1, len(a.u) + 1),
                i -> a.u[i] * b.u[i])), 6) >= {SEM_TAU}
),
per_cluster AS (
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
           CAST(COUNT(DISTINCT id_b) AS BIGINT) AS n_dropped
    FROM pairs GROUP BY cid
)
SELECT s.cid AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       COALESCE(MAX(p.n_dup_pairs), 0) AS n_dup_pairs,
       COALESCE(MAX(p.n_dropped), 0) AS n_dropped,
       ROUND(CAST(COALESCE(MAX(p.n_dropped), 0) AS DOUBLE) / COUNT(*), 6)
           AS drop_rate
FROM assigned s LEFT JOIN per_cluster p ON s.cid = p.cid
GROUP BY s.cid
ORDER BY cluster
""",
    tags=("dedup", "semantic", "embedding"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: assign every embedding to its nearest of {SEM_K}
    coarse centroids (deterministic seeding with the first K vectors —
    the same oracle-portable discipline as emb_kmeans; production
    swaps in the IVF-trained quantizer, operators/ivf.py), then flag
    within-cluster pairs with cosine >= {SEM_TAU} and drop every
    vector that has a LOWER-ID near-duplicate in its cluster.
    Reports per cluster: size, duplicate pairs, drops, drop rate.

    Scale shape: the published point of SemDeDup is that the cluster
    assignment BOUNDS the quadratic — the pair join is an equi-join on
    (cluster id, salt), O(sum of cluster_size^2) instead of O(N^2),
    and cluster count is the knob that caps bucket size (same valve as
    dedup_minhash_capped's). Two measured optimizations shape the pair
    stage: vectors are UNIT-NORMALIZED once up front so the pair
    predicate is a single dot fold (cosine per pair costs 3 folds —
    ~3x the arithmetic), and the join is salted into SEM_SALT
    sub-buckets per cluster because SEM_K join keys alone cap
    parallelism at SEM_K tasks (operators/skew.py discipline);
    together 7.4 -> 2.0 s warm at sf0.1. Assignment is a broadcast of
    K x dims centroids + one codegen fold per vector (no shuffle);
    distances and dots round to 6 before every compare so argmin and
    threshold cuts are engine-exact. The drop rule (keep the lowest
    id) is the cheap one-pass survivor policy; dedup_keep_best shows
    the quality-ranked variant."""
    emb = load_table(spark, sf_dir, "embeddings")
    # The assignment fold (N x K distance folds) and the unit-normalize
    # fold are fused onto the single-split embeddings scan; no
    # per-partition sampling on this path, so the compute-bearing scans
    # fan out (guide §2.5). The centroid build stays un-fanned (K rows,
    # broadcast side).
    emb_fan = load_table(spark, sf_dir, "embeddings", fanout=True)
    cents = emb.where(F.col("vec_id") < SEM_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    diff_sq = F.zip_with(
        "embedding",
        "cemb",
        lambda x, c: (x.cast("double") - c.cast("double"))
        * (x.cast("double") - c.cast("double")),
    )
    d2 = F.round(
        F.aggregate(diff_sq, F.lit(0.0), lambda acc, v: acc + v), 6
    )
    # localCheckpoint: `assigned` feeds the pair join AND the final
    # per-cluster size rollup — without it the N x K assignment fold
    # re-executes per consumer (guide §2.4 duplicated-subtree rule).
    assigned = (
        emb_fan.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cid"))
    ).localCheckpoint()
    # Pre-normalize ONCE per vector (N folds) so the pair predicate is
    # a single dot fold instead of cosine's dot + two norms (3 folds
    # per pair — measured ~3x the arithmetic at sf0.1). And SALT the
    # pair join: cid alone has only SEM_K distinct values, which caps
    # the join at SEM_K tasks no matter how many cores exist — the
    # b-side hashes into SEM_SALT sub-buckets, the a-side explodes
    # over them (operators/skew.py discipline), giving SEM_K*SEM_SALT
    # parallel units while generating exactly the same pairs.
    from target_iceberg_spark.functions.vectors import dot, sq_norm

    nrm = F.sqrt(sq_norm("embedding"))
    unit = F.transform("embedding", lambda x: x.cast("double") / nrm)
    # localCheckpoint: `with_vec` is BOTH sides of the pair self-join —
    # without it the normalize fold + assignment join execute twice.
    with_vec = assigned.join(
        emb_fan.select("vec_id", unit.alias("u")), "vec_id"
    ).localCheckpoint()
    a = with_vec.select(
        "cid",
        F.col("vec_id").alias("vid_a"),
        F.col("u").alias("u_a"),
        F.explode(F.sequence(F.lit(0), F.lit(SEM_SALT - 1))).alias("salt"),
    )
    b = with_vec.select(
        "cid",
        F.col("vec_id").alias("vid_b"),
        F.col("u").alias("u_b"),
        (F.col("vec_id") % SEM_SALT).cast("int").alias("salt"),
    )
    pairs = a.join(
        b,
        ["cid", "salt"],
    ).where(
        (F.col("vid_a") < F.col("vid_b"))
        & (F.round(dot("u_a", "u_b"), 6) >= SEM_TAU)
    )
    per_cluster = pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("vid_b").alias("n_dropped"),
    )
    return (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .join(per_cluster, "cid", "left")
        .select(
            F.col("cid").alias("cluster"),
            "n_vectors",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.round(
                F.coalesce("n_dropped", F.lit(0)).cast("double")
                / F.col("n_vectors"),
                6,
            ).alias("drop_rate"),
        )
        .orderBy("cluster")
    )
