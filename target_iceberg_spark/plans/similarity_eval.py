"""Ranked-retrieval quality evaluation: NDCG@k (SURVEY.md §2B
similarity tier, round-6 post-window).

sim_recall_audit / sim_ann_quality report RECALL — did the right ids
come back at all; NDCG (Järvelin & Kekäläinen, TOIS 2002, public) is
the graded, position-discounted metric that also penalizes burying a
relevant hit at rank k. With label agreement as binary relevance (the
standard proxy when no human judgments exist), this runs the exact
evaluation loop a retrieval team runs beside its index — entirely
inside the engine, one corpus scan for all probes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.vectors import cosine
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

NDCG_PROBES = 5  # anchors: vec_id < NDCG_PROBES
NDCG_K = 10

_COS_SQL = (
    "ROUND((list_sum(list_transform(range(1, len(e.embedding) + 1),"
    " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p[i] AS DOUBLE)))"
    " / sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),"
    " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))"
    " * list_sum(list_transform(range(1, len(p) + 1),"
    " i -> CAST(p[i] AS DOUBLE) * CAST(p[i] AS DOUBLE))))), 6)"
)


@register(
    "sim_ndcg_audit",
    oracle=f"""
WITH probes AS (
    SELECT vec_id AS probe_id, label AS probe_label, embedding AS p
    FROM embeddings WHERE vec_id < {NDCG_PROBES}
),
scored AS (
    SELECT probe_id, probe_label, e.vec_id, e.label,
           {_COS_SQL} AS cos_sim
    FROM embeddings e, probes
    WHERE e.vec_id >= {NDCG_PROBES}
),
nrel AS (
    SELECT probe_id,
           CAST(SUM(CASE WHEN label = probe_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rel
    FROM scored GROUP BY probe_id
),
topk AS (
    SELECT probe_id, label, probe_label,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY cos_sim DESC, vec_id) AS rnk
    FROM scored
    QUALIFY rnk <= {NDCG_K}
),
dcg AS (
    SELECT probe_id,
           SUM(CASE WHEN label = probe_label
                    THEN 1.0 / (LN(rnk + 1) / LN(2)) ELSE 0 END) AS dcg,
           CAST(SUM(CASE WHEN label = probe_label THEN 1 ELSE 0 END)
                AS BIGINT) AS rel_at_k
    FROM topk GROUP BY probe_id
),
idcg AS (
    SELECT nrel.probe_id, nrel.n_rel,
           SUM(CASE WHEN i <= LEAST(nrel.n_rel, {NDCG_K})
                    THEN 1.0 / (LN(i + 1) / LN(2)) ELSE 0 END) AS idcg
    FROM nrel CROSS JOIN (SELECT unnest(range(1, {NDCG_K} + 1)) AS i)
    GROUP BY nrel.probe_id, nrel.n_rel
)
SELECT dcg.probe_id, idcg.n_rel, dcg.rel_at_k,
       ROUND(dcg.dcg, 6) AS dcg,
       ROUND(idcg.idcg, 6) AS idcg,
       ROUND(dcg.dcg / idcg.idcg, 6) AS ndcg
FROM dcg JOIN idcg ON dcg.probe_id = idcg.probe_id
ORDER BY dcg.probe_id
""",
    tags=("similarity", "evaluation", "ndcg"),
)
def sim_ndcg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{NDCG_K} of exact cosine retrieval per anchor, with label
    agreement as binary relevance: DCG discounts each relevant hit by
    1/log2(rank+1), the ideal DCG packs min(n_rel, k) relevant hits at
    the top, and the ratio is the position-aware quality score recall
    alone cannot express — the continuous-evaluation row a retrieval
    pipeline tracks for ranking regressions (a reranker that buries
    relevant hits keeps recall but drops NDCG).

    Scale shape: the same broadcast-anchor one-scan discipline as
    sim_cosine_topk_batch / sim_hard_negatives — score every
    (candidate, anchor) pair JVM-side, per-anchor top-k via the
    bounded probe_id window, per-anchor relevant-population count as
    one combinable aggregate on the SAME scored frame (no second
    scan); the discount table is a k-row literal fanout. log2 via
    ln/ln2 identically in both engines; ROUND(...,6) at the end."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < NDCG_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("probe_vec"),
    )
    scored = (
        emb.where(F.col("vec_id") >= NDCG_PROBES)
        .crossJoin(F.broadcast(probes))
        .select(
            "probe_id",
            "probe_label",
            "vec_id",
            "label",
            F.round(cosine("embedding", "probe_vec"), 6).alias("cos_sim"),
        )
    )
    rel = F.when(F.col("label") == F.col("probe_label"), 1).otherwise(0)
    nrel = scored.groupBy("probe_id").agg(
        F.sum(rel).cast("bigint").alias("n_rel")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "vec_id")
    log2 = F.log(F.lit(2.0))
    topk = scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= NDCG_K
    )
    dcg = topk.groupBy("probe_id").agg(
        F.sum(
            F.when(rel == 1, F.lit(1.0) / (F.log(F.col("rnk") + 1) / log2))
            .otherwise(0.0)
        ).alias("dcg"),
        F.sum(rel).cast("bigint").alias("rel_at_k"),
    )
    ranks = spark.range(1, NDCG_K + 1).select(F.col("id").alias("i"))
    idcg = (
        nrel.crossJoin(F.broadcast(ranks))
        .groupBy("probe_id", "n_rel")
        .agg(
            F.sum(
                F.when(
                    F.col("i") <= F.least(F.col("n_rel"), F.lit(NDCG_K)),
                    F.lit(1.0) / (F.log(F.col("i") + 1) / log2),
                ).otherwise(0.0)
            ).alias("idcg")
        )
    )
    return (
        dcg.join(idcg, "probe_id")
        .select(
            "probe_id",
            "n_rel",
            "rel_at_k",
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
        .orderBy("probe_id")
    )
