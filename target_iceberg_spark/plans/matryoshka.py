"""Matryoshka / prefix-dimension retrieval (SURVEY.md §2B similarity
north star, round-5 post-window).

Matryoshka Representation Learning (Kusupati et al., NeurIPS 2022)
trains embeddings whose PREFIX dimensions are themselves valid
lower-dimensional embeddings, so a retrieval system can score with the
first d' << d dims (4x less IO and compute here) and only spend full
dimensionality where it matters. This query is the evaluation harness
for that trade: prefix-scored top-k, each hit re-scored at full
dimensionality and flagged for whether the full-dim exact top-k agrees.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.functions.vectors import cosine, cosine_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.similarity import PROBE_VEC_ID, TOP_K
from target_iceberg_spark.sources.tables import load_table

PREFIX_DIMS = 16  # first 16 of 64 dims — the 4x-cheaper scoring arm


@register(
    "sim_matryoshka_prefix",
    oracle=f"""
WITH probe AS (
    SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
scored AS (
    SELECT vec_id,
           ROUND({cosine_sql(f'embedding[1:{PREFIX_DIMS}]', f'p[1:{PREFIX_DIMS}]')},
                 6) AS prefix_sim,
           ROUND({cosine_sql('embedding', 'p')}, 6) AS full_sim
    FROM embeddings, probe
    WHERE vec_id <> {PROBE_VEC_ID}
),
full_topk AS (
    SELECT vec_id FROM scored
    ORDER BY full_sim DESC, vec_id LIMIT {TOP_K}
)
SELECT s.vec_id, s.prefix_sim, s.full_sim,
       s.vec_id IN (SELECT vec_id FROM full_topk) AS in_full_topk
FROM scored s
ORDER BY s.prefix_sim DESC, s.vec_id
LIMIT {TOP_K}
""",
    tags=("similarity", "matryoshka", "ann"),
)
def sim_matryoshka_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension retrieval audit (Matryoshka, NeurIPS 2022):
    score the corpus with only the first 16 of 64 embedding dims (the
    cheap arm — a 4x cut in per-vector FLOPs and, with dimension-major
    storage, scan bytes), take its top-k, and report each hit's
    full-dimensional score plus whether the full-dim exact top-k
    agrees. On MRL-trained embeddings the overlap is high and the
    prefix arm becomes the first stage of a rerank cascade; on these
    synthetic uniform vectors the honest overlap is low — the audit's
    job is exactly to report that before anyone ships the cheap arm.

    Scale shape: one corpus scan computes BOTH sims in the same
    codegen projection against the broadcast probe; both top-k cuts
    are TakeOrderedAndProject; the agreement flag is a left join
    against a k-row id set. Nothing shuffles the embedding column."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe_row = bounded_collect(
        emb.where(F.col("vec_id") == PROBE_VEC_ID),
        cap=1,
        why="unique vec_id == PROBE_VEC_ID literal",
        structural=False,
    )[0]
    p = [float(x) for x in probe_row["embedding"]]
    p_full = F.array(*[F.lit(v) for v in p])
    p_pref = F.array(*[F.lit(v) for v in p[:PREFIX_DIMS]])
    scored = emb.where(F.col("vec_id") != PROBE_VEC_ID).select(
        "vec_id",
        F.round(
            cosine(F.slice("embedding", 1, PREFIX_DIMS), p_pref), 6
        ).alias("prefix_sim"),
        F.round(cosine("embedding", p_full), 6).alias("full_sim"),
    )
    full_ids = (
        scored.orderBy(F.desc("full_sim"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.lit(True).alias("in_full_topk"))
    )
    return (
        scored.orderBy(F.desc("prefix_sim"), "vec_id")
        .limit(TOP_K)
        .join(F.broadcast(full_ids), "vec_id", "left")
        .select(
            "vec_id",
            "prefix_sim",
            "full_sim",
            F.coalesce("in_full_topk", F.lit(False)).alias("in_full_topk"),
        )
        .orderBy(F.desc("prefix_sim"), "vec_id")
    )
