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
equi-join on cluster id — never a cross product.

An IVF index is built ONCE and searched many times — at 100 TB,
re-fitting the quantizer per query would dwarf the search itself. So
build and search are split: :func:`build_or_load_ivf` persists the
posting lists PARTITIONED BY cluster id (a search's
``cluster IN (...)`` filter becomes partition pruning — only the
probed lists' files are read) plus the centroid table, keyed by the
source file's identity; :func:`ivf_search` runs against the prebuilt
index. :func:`build_ivf` stays as the in-memory path for tests.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.vectors import cosine


# quantizer-training sample target: ~2^10 points per centroid at k=16;
# past this, more training data barely moves a COARSE quantizer but the
# fit cost keeps growing linearly (at 100 TB, fitting on the full corpus
# would dominate the build by orders of magnitude)
TRAIN_SAMPLE_ROWS = 20_000


def build_ivf(emb: DataFrame, vec_col: str = "embedding", k: int = 16, seed: int = 42):
    """Fit the coarse quantizer and return (assigned_df, centroids):
    assigned_df = emb + `cluster` column; centroids = ndarray [k, d].

    The k-means fit runs on a bounded deterministic sample
    (~TRAIN_SAMPLE_ROWS); assignment then covers the full corpus via
    one `model.transform` pass — the standard IVF build split."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = emb.withColumn("_vec", array_to_vector(F.col(vec_col).cast("array<double>")))
    n = with_vec.count()
    train = (
        with_vec.sample(fraction=min(1.0, TRAIN_SAMPLE_ROWS / n), seed=seed)
        if n > TRAIN_SAMPLE_ROWS
        else with_vec
    )
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
    ).fit(train)
    assigned = model.transform(with_vec).drop("_vec")
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


@dataclass
class IVFIndex:
    """A prebuilt IVF index: posting lists (DataFrame with a `cluster`
    column, cluster-partitioned when loaded from disk) + centroids."""

    postings: DataFrame
    centroids: np.ndarray


def index_cache_path(source_file: str, vec_col: str, k: int, seed: int) -> str:
    """Deterministic on-disk location for the index built over one
    source file. The key folds in the file's size + mtime so a
    regenerated corpus invalidates the cached index."""
    st = os.stat(source_file)
    key = hashlib.md5(
        f"{os.path.abspath(source_file)}|{st.st_size}|{st.st_mtime_ns}"
        f"|{vec_col}|{k}|{seed}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "target_iceberg_spark_ivf", key)


def build_or_load_ivf(
    spark: SparkSession,
    emb: DataFrame,
    index_path: str,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
) -> IVFIndex:
    """Load the persisted index at ``index_path``, building it first if
    absent. The build writes posting lists partitioned by cluster id
    (searches prune to the probed clusters' files) and the centroid
    table, staged to a temp dir + atomic rename so concurrent builders
    never expose a half-written index."""
    marker = os.path.join(index_path, "_BUILT")
    if not os.path.exists(marker):
        assigned, centroids = build_ivf(emb, vec_col=vec_col, k=k, seed=seed)
        stage = f"{index_path}__stage_{uuid.uuid4().hex[:8]}"
        try:
            # shuffle to one partition per cluster first: otherwise every
            # write task emits a file into every cluster directory
            # (tasks x k tiny files); this yields k well-sized files
            assigned.repartition(k, "cluster").write.partitionBy("cluster").parquet(
                os.path.join(stage, "postings")
            )
            spark.createDataFrame(
                [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
                "cluster int, centroid array<double>",
            ).coalesce(1).write.parquet(os.path.join(stage, "centroids"))
            open(os.path.join(stage, "_BUILT"), "w").close()
            os.makedirs(os.path.dirname(index_path), exist_ok=True)
            try:
                os.rename(stage, index_path)
            except OSError:
                pass  # a concurrent builder won the rename; use theirs
        finally:
            if os.path.isdir(stage):
                shutil.rmtree(stage, ignore_errors=True)
    rows = spark.read.parquet(os.path.join(index_path, "centroids")).collect()
    centroids = np.vstack(
        [np.asarray(r["centroid"]) for r in sorted(rows, key=lambda r: r["cluster"])]
    )
    postings = spark.read.parquet(os.path.join(index_path, "postings"))
    return IVFIndex(postings=postings, centroids=centroids)


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
