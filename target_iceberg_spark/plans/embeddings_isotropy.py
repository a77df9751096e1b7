"""Embedding isotropy / anisotropy audit (SURVEY.md §2B embeddings
tier, round 9).

Contextual embedding spaces are notoriously ANisotropic — vectors
crowd a narrow cone, so the expected cosine between two random
vectors is far above zero (Ethayarajh EMNLP'19; Mu & Viswanath
ICLR'18 all-but-the-top — public). A high mean pairwise cosine
degrades every downstream consumer in this engine (ANN recall,
near-dup thresholds, MMR diversity), so corpus audits measure it
before fixing thresholds.

The naive estimator is O(N^2) pairs. This query uses the exact
closed form instead: with unit-normalized vectors u_i, the mean
pairwise cosine over all i != j is (|S|^2 - N) / (N(N-1)) where
S = sum(u_i) — because |S|^2 = sum_ij u_i.u_j counts N self-pairs at
exactly 1. One combinable pass, zero pairs materialized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.vectors import sq_norm
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "emb_isotropy",
    oracle="""
WITH u AS (
    SELECT label, vec_id, embedding,
           sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                i -> CAST(embedding[i] AS DOUBLE)
                     * CAST(embedding[i] AS DOUBLE)))) AS nrm
    FROM embeddings
),
comp AS (
    SELECT label, i.i AS dim,
           SUM(CAST(embedding[i.i] AS DOUBLE) / nrm) AS s
    FROM u, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) i
    GROUP BY label, i.i
),
snorm AS (
    SELECT label, SUM(s * s) AS s2 FROM comp GROUP BY label
),
base AS (
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           AVG(nrm) AS mean_norm
    FROM u GROUP BY label
)
SELECT b.label, b.n_vectors,
       ROUND(b.mean_norm, 6) AS mean_norm,
       ROUND((s.s2 - b.n_vectors)
             / (b.n_vectors * (b.n_vectors - 1.0)), 6)
           AS mean_pairwise_cos,
       ROUND(sqrt(s.s2) / b.n_vectors, 6) AS norm_of_mean_unit
FROM base b JOIN snorm s ON b.label = s.label
ORDER BY b.label
""",
    tags=("embeddings", "similarity", "profiling"),
)
def emb_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label isotropy audit: mean raw norm, EXACT mean pairwise
    cosine via the closed form (|sum of unit vectors|^2 - N)/(N(N-1)),
    and the norm of the mean unit vector (0 = perfectly isotropic,
    1 = all vectors identical).

    Scale shape: one posexplode to (label, dim) rows — fan-out is d
    per vector, d = a model constant — then two combinable groupBys:
    per-(label, dim) component sums (at most |labels| x d rows ever
    shuffle) and the per-label fold of those d rows. No pair is ever
    materialized; the N^2 estimator collapses into a vector sum, which
    is the whole point of running it at corpus scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    u = emb.select(
        "label",
        "embedding",
        F.sqrt(sq_norm("embedding")).alias("nrm"),
    )
    comp = (
        u.select(
            "label",
            F.posexplode("embedding").alias("dim", "val"),
            "nrm",
        )
        .groupBy("label", "dim")
        .agg(F.sum(F.col("val").cast("double") / F.col("nrm")).alias("s"))
    )
    snorm = comp.groupBy("label").agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    base = u.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.avg("nrm").alias("mean_norm"),
    )
    n = F.col("n_vectors").cast("double")
    return (
        base.join(snorm, "label")
        .select(
            "label",
            "n_vectors",
            F.round("mean_norm", 6).alias("mean_norm"),
            F.round((F.col("s2") - n) / (n * (n - F.lit(1.0))), 6).alias(
                "mean_pairwise_cos"
            ),
            F.round(F.sqrt("s2") / n, 6).alias("norm_of_mean_unit"),
        )
        .orderBy("label")
    )
