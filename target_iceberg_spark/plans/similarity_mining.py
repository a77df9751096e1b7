"""Hard-negative mining for contrastive embedding training
(SURVEY.md §2B similarity tier, round-6 post-window).

Contrastive training (SimCLR/DPR-style, public) needs, for each
anchor, the most-similar examples with a DIFFERENT label — "hard"
negatives near the decision boundary train far better than random
ones. This is the retrieval pass a training-data pipeline runs over
the whole corpus before batch assembly: exact top-k per anchor,
restricted to label mismatches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.vectors import cosine
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

HN_PROBES = 5  # anchors: vec_id < HN_PROBES
HN_K = 5  # hard negatives per anchor

_COS_SQL = (
    "ROUND((list_sum(list_transform(range(1, len(e.embedding) + 1),"
    " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p[i] AS DOUBLE)))"
    " / sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),"
    " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))"
    " * list_sum(list_transform(range(1, len(p) + 1),"
    " i -> CAST(p[i] AS DOUBLE) * CAST(p[i] AS DOUBLE))))), 6)"
)


@register(
    "sim_hard_negatives",
    oracle=f"""
WITH probes AS (
    SELECT vec_id AS probe_id, label AS probe_label, embedding AS p
    FROM embeddings WHERE vec_id < {HN_PROBES}
),
scored AS (
    SELECT probe_id, e.vec_id, e.label AS neg_label,
           {_COS_SQL} AS cos_sim
    FROM embeddings e, probes
    WHERE e.vec_id >= {HN_PROBES} AND e.label <> probes.probe_label
)
SELECT probe_id, vec_id, neg_label, cos_sim FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                 ORDER BY cos_sim DESC, vec_id) AS rn
    FROM scored
) WHERE rn <= {HN_K}
ORDER BY probe_id, cos_sim DESC, vec_id
""",
    tags=("similarity", "mining", "training"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HN_K} hard negatives per anchor: for each of {HN_PROBES}
    anchor vectors, the most cosine-similar corpus vectors whose LABEL
    DIFFERS — the near-boundary examples contrastive training mines
    before batch assembly (random negatives are trivially separable;
    hard ones carry the gradient).

    Scale shape: identical discipline to sim_cosine_topk_batch — the
    anchor set (with labels) broadcasts, ONE corpus scan scores every
    (candidate, anchor) pair JVM-side inside codegen (double-cast
    sequential fold, the vectors.py kernel), the label-mismatch filter
    drops same-class pairs BEFORE the window, and per-anchor top-k is
    a bounded window over probe_id. One scan regardless of anchor
    count; on a real corpus the anchor set is a batch of a few
    thousand, exactly this shape. ROUND(...,6) on the similarity is
    the established cross-engine float discipline."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < HN_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("probe_vec"),
    )
    scored = (
        emb.where(F.col("vec_id") >= HN_PROBES)
        .crossJoin(F.broadcast(probes))
        .where(F.col("label") != F.col("probe_label"))
        .select(
            "probe_id",
            "vec_id",
            F.col("label").alias("neg_label"),
            F.round(cosine("embedding", "probe_vec"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= HN_K)
        .select("probe_id", "vec_id", "neg_label", "cos_sim")
        .orderBy("probe_id", F.desc("cos_sim"), "vec_id")
    )
