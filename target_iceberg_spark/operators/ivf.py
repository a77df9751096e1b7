"""IVF-style approximate nearest neighbor: k-means coarse quantizer +
multi-probe search.

The inverted-file (IVF) recipe behind most production vector indexes:
  1. TRAIN: k-means over (a sample of) the corpus -> k centroids.
  2. ASSIGN: each vector joins its nearest centroid's posting list —
     one shuffle on the cluster id; lists are disjoint partitions.
  3. SEARCH: a probe scores only the `nprobe` clusters whose centroids
     are nearest — work per probe drops from O(N·d) to
     O(nprobe · N/k · d) plus the k-centroid scan.

Spark mapping: MLlib KMeans (seeded) for step 1; `model.transform`
for step 2; step 3 broadcasts the (tiny) centroid table, picks the
probe's nprobe clusters driver-side, and the candidate scan is an
equi-join on cluster id — never a cross product. At 100 TB the posting
lists would be written bucketed by cluster id so repeated searches
skip the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from target_iceberg_spark.functions.vectors import cosine


def build_ivf(emb: DataFrame, vec_col: str = "embedding", k: int = 16, seed: int = 42):
    """Fit the coarse quantizer and return (assigned_df, centroids):
    assigned_df = emb + `cluster` column; centroids = ndarray [k, d]."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = emb.withColumn("_vec", array_to_vector(F.col(vec_col).cast("array<double>")))
    # Coarse quantizer, not a clustering result: a few Lloyd iterations
    # with random init partition space well enough for posting lists,
    # at a fraction of the default 20-iteration k-means|| cost.
    model = KMeans(
        k=k,
        seed=seed,
        maxIter=5,
        initMode="random",
        featuresCol="_vec",
        predictionCol="cluster",
    ).fit(with_vec)
    assigned = model.transform(with_vec).drop("_vec")
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    probe_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    top_k: int = 5,
) -> DataFrame:
    """Score only the nprobe nearest clusters for one probe vector."""
    probe = np.asarray(probe_vec, dtype="float64")
    dists = np.linalg.norm(centroids - probe, axis=1)
    clusters = [int(c) for c in np.argsort(dists)[:nprobe]]
    probe_lit = F.array(*[F.lit(float(x)) for x in probe])
    return (
        assigned.where(F.col("cluster").isin(clusters))
        .select(
            id_col,
            "cluster",
            F.round(cosine(F.col(vec_col), probe_lit), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(top_k)
    )
