"""k-nearest-neighbor classification over the embedding column
(SURVEY.md §2B similarity north star, round-5 post-window).

The retrieval plans in plans/similarity.py return neighbors; this
closes the loop into the classic downstream task — predict a label by
majority vote of the k nearest labeled vectors — the standard
weak-labeling / label-propagation step in training-data pipelines
(auto-labeling new documents from a small curated seed set).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.vectors import cosine, cosine_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

KNN_K = 5
KNN_PROBES = 20  # vec_id < this are the unlabeled probes


@register(
    "sim_knn_classify",
    oracle=f"""
WITH probes AS (
    SELECT vec_id AS probe_id, embedding AS p, label AS actual_label
    FROM embeddings WHERE vec_id < {KNN_PROBES}
),
corpus AS (
    SELECT vec_id, embedding, label FROM embeddings
    WHERE vec_id >= {KNN_PROBES}
),
scored AS (
    SELECT probe_id, actual_label, c.vec_id, c.label,
           {cosine_sql('c.embedding', 'p')} AS cos_sim
    FROM corpus c, probes
),
topk AS (
    SELECT * FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) <= {KNN_K}
),
votes AS (
    SELECT probe_id, actual_label, label,
           CAST(COUNT(*) AS BIGINT) AS n_votes
    FROM topk GROUP BY probe_id, actual_label, label
)
SELECT probe_id, actual_label, label AS predicted_label, n_votes,
       (label = actual_label) AS correct
FROM votes
QUALIFY row_number() OVER (
    PARTITION BY probe_id ORDER BY n_votes DESC, label) = 1
ORDER BY probe_id
""",
    tags=("similarity", "knn", "classification"),
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label prediction: for each of {KNN_PROBES} probe vectors,
    take the {KNN_K} nearest corpus vectors by exact cosine and
    predict the majority label (ties broken toward the smaller label),
    reporting the vote count and whether the prediction matches the
    held-out true label.

    Scale shape: the probe set broadcasts ({KNN_PROBES} rows), the
    corpus streams once through the codegen cosine fold — O(P*N*d)
    with NO shuffle of the corpus; the rank window runs per-probe
    (P bounded partitions), then voting is a combinable count over
    P*k rows and the argmax another k-row window. Swap the brute-force
    arm for this module's IVF/LSH candidate generators when N makes
    one pass too slow — the vote finisher is unchanged. Exactly the
    auto-labeling sweep a training pipeline runs: probes = new
    documents, corpus = the curated seed set."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < KNN_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p"),
        F.col("label").alias("actual_label"),
    )
    corpus = emb.where(F.col("vec_id") >= KNN_PROBES)
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "actual_label",
        "vec_id",
        "label",
        cosine("embedding", "p").alias("cos_sim"),
    )
    topk = scored.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("probe_id").orderBy(
                F.desc("cos_sim"), "vec_id"
            )
        ),
    ).where(F.col("rnk") <= KNN_K)
    votes = topk.groupBy("probe_id", "actual_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    return (
        votes.withColumn(
            "vrnk",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(
                    F.desc("n_votes"), "label"
                )
            ),
        )
        .where(F.col("vrnk") == 1)
        .select(
            "probe_id",
            "actual_label",
            F.col("label").alias("predicted_label"),
            "n_votes",
            (F.col("label") == F.col("actual_label")).alias("correct"),
        )
        .orderBy("probe_id")
    )
