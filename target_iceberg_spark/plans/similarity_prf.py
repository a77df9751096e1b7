"""Rocchio pseudo-relevance feedback (SURVEY.md §2B similarity tier,
round 9).

The oldest trick in retrieval that still ships (Rocchio 1971; the PRF
baseline in every IR textbook, public): take the query's top-k hits,
ASSUME they are relevant, pull the query vector toward their centroid
(q' = q + beta * mean(top-k)), and search again. One extra scan buys
a recall bump on under-specified queries — the dense-retrieval form
below is exactly what query-expansion reranking does over an
embedding index.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.functions.vectors import cosine, cosine_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.similarity import PROBE_VEC_ID
from target_iceberg_spark.sources.tables import load_table

PRF_FEEDBACK_K = 5  # pseudo-relevant set size
PRF_BETA = 0.75  # classic Rocchio feedback weight
PRF_TOP = 10  # final result size


def _prf_oracle() -> str:
    cos0 = f"ROUND({cosine_sql('e.embedding', 'p.p')}, 6)"
    cosx = f"ROUND({cosine_sql('e.embedding', 'c.q')}, 6)"
    return f"""
WITH probe AS (
    SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
scored0 AS (
    SELECT e.vec_id, {cos0} AS cos_orig
    FROM embeddings e, probe p
    WHERE e.vec_id <> {PROBE_VEC_ID}
),
ranked0 AS (
    SELECT vec_id, cos_orig,
           CAST(ROW_NUMBER() OVER (ORDER BY cos_orig DESC, vec_id)
                AS BIGINT) AS rank_orig
    FROM scored0
),
fb AS (
    SELECT vec_id FROM ranked0 WHERE rank_orig <= {PRF_FEEDBACK_K}
),
dims AS (
    SELECT i.i AS dim,
           AVG(CAST(e.embedding[i.i] AS DOUBLE)) AS m
    FROM embeddings e JOIN fb USING (vec_id),
         LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) i
    GROUP BY 1
),
cent AS (
    SELECT list(CAST(p.p[d.dim] AS DOUBLE) + {PRF_BETA} * d.m
                ORDER BY d.dim) AS q
    FROM dims d, probe p
    GROUP BY ALL
),
rescored AS (
    SELECT r.vec_id, r.cos_orig, r.rank_orig, {cosx} AS cos_expanded
    FROM ranked0 r
    JOIN embeddings e ON e.vec_id = r.vec_id, cent c
)
SELECT vec_id, cos_orig, cos_expanded, rank_orig,
       CAST(ROW_NUMBER() OVER (ORDER BY cos_expanded DESC, vec_id)
            AS BIGINT) AS rank_new
FROM rescored
ORDER BY rank_new
LIMIT {PRF_TOP}
"""


@register(
    "sim_prf_rocchio",
    oracle=_prf_oracle(),
    tags=("similarity", "retrieval", "feedback"),
)
def sim_prf_rocchio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query expansion by pseudo-relevance feedback: score the corpus
    against the probe, take the top-{PRF_FEEDBACK_K} as pseudo-
    relevant, move the query to q' = q + {PRF_BETA} * centroid(top-k),
    and return the top-{PRF_TOP} under q' with both rounds' scores and
    ranks side by side — the rank movement IS the feedback effect.

    Scale shape: two broadcast-probe scans of the corpus (the proven
    sim_cosine_topk codegen-fold shape) separated by ONE bounded
    collect of {PRF_FEEDBACK_K} x d doubles to build the expanded
    query literal (the documented probe-row collect class). NO global
    window ever ranks the corpus: both top-k cuts are
    TakeOrderedAndProject, rank_orig for the {PRF_TOP} reported rows
    is a broadcast threshold-count (1 + how many candidates beat the
    row under the original ordering — a combinable aggregate), and
    rank_new is a window over the {PRF_TOP}-row result only. Ranks
    compare 6-rounded scores so cross-engine ordering can't flip on a
    ulp."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probe_vec = [
        float(x)
        for x in bounded_collect(
            emb.where(F.col("vec_id") == PROBE_VEC_ID),
            cap=1,
            why="unique vec_id == PROBE_VEC_ID literal",
            structural=False,
        )[0]["embedding"]
    ]
    p_lit = F.array(*[F.lit(v) for v in probe_vec])
    scored0 = emb.where(F.col("vec_id") != PROBE_VEC_ID).select(
        "vec_id",
        "embedding",
        F.round(cosine("embedding", p_lit), 6).alias("cos_orig"),
    )
    fb = bounded_collect(
        scored0.orderBy(F.desc("cos_orig"), "vec_id")
        .limit(PRF_FEEDBACK_K)
        .select("embedding"),
        cap=PRF_FEEDBACK_K,
        why="explicit limit(PRF_FEEDBACK_K) x d doubles",
    )
    d = len(probe_vec)
    centroid = [
        sum(float(r["embedding"][i]) for r in fb) / len(fb) for i in range(d)
    ]
    q_lit = F.array(
        *[
            F.lit(probe_vec[i] + PRF_BETA * centroid[i])
            for i in range(d)
        ]
    )
    rescored = scored0.select(
        "vec_id",
        "cos_orig",
        F.round(cosine("embedding", q_lit), 6).alias("cos_expanded"),
    )
    top = rescored.orderBy(F.desc("cos_expanded"), "vec_id").limit(PRF_TOP)
    t = top.select(
        F.col("vec_id").alias("t_vec"),
        F.col("cos_orig").alias("t_cos"),
        F.col("cos_expanded").alias("t_cosx"),
    )
    beats = (
        rescored.select("vec_id", "cos_orig")
        .crossJoin(F.broadcast(t))
        .where(
            (F.col("cos_orig") > F.col("t_cos"))
            | (
                (F.col("cos_orig") == F.col("t_cos"))
                & (F.col("vec_id") < F.col("t_vec"))
            )
        )
        .groupBy("t_vec")
        .agg(F.count(F.lit(1)).alias("n_beats"))
    )
    ranked = t.join(beats, "t_vec", "left").select(
        F.col("t_vec").alias("vec_id"),
        F.col("t_cos").alias("cos_orig"),
        F.col("t_cosx").alias("cos_expanded"),
        (F.coalesce("n_beats", F.lit(0)) + 1).cast("bigint").alias(
            "rank_orig"
        ),
    )
    w_new = Window.orderBy(F.desc("cos_expanded"), "vec_id")
    return (
        ranked.withColumn(
            "rank_new", F.row_number().over(w_new).cast("bigint")
        )
        .orderBy("rank_new")
        .select("vec_id", "cos_orig", "cos_expanded", "rank_orig", "rank_new")
    )
