"""Embedding-level eval-set decontamination (SURVEY.md §2B curation
north star, round 13; VERDICT r12 task 3).

text_decontaminate strikes training docs that share n-grams with a
benchmark; this is its SEMANTIC twin: a pool document is contaminated
when its embedding's max cosine against any held-out eval vector
reaches DECON_TAU — the paraphrase/translation leakage that n-gram
overlap cannot see. Public basis: the benchmark-contamination audit
methodology of the GPT-3 appendix (Brown et al. 2020, appendix C) and
Dodge et al. EMNLP'21 §4, moved from token space to embedding space
(as in SemDeDup, Abbas et al. 2023 — plans/dedup_semantic.py).

The audit is self-proving: a deterministic md5-selected subset of the
eval vectors is re-planted into the pool under a '_planted' source
with a small element-wise perturbation (cosine to the original stays
>= 0.95/1.05 > 0.9 for ANY vector — the scaling factors bound the
Rayleigh quotient), so the report's '_planted' row IS the detector's
recall on known-positives, and the recall_ok column bakes the
DECON_RECALL_FLOOR into the hashed result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.hashing import md5_quarter, md5_quarter_sql
from target_iceberg_spark.functions.rounding import (
    portable_round,
    portable_round_sql,
)
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

DECON_EVAL_HEX = ("0", "1")  # md5-prefix eval split (~1/8 of the pin)
# The eval set stands in for a FIXED external benchmark, so it must
# not grow with the corpus (the inverse of the r12 ANN-knob rule:
# index knobs derive from corpus size, benchmark fixtures never do).
# Pinning the split to the first DECON_EVAL_ID_CAP ids keeps the
# driver-gate (sf0.01, ids 0-499) instantiation identical while the
# detector's cost stays LINEAR in the pool at every larger SF — the
# round-13 scale audit measured 15.3x on 10x data with a
# corpus-proportional split, 10.3x (linear) with the pin.
DECON_EVAL_ID_CAP = 500
DECON_PLANT_HEX = ("0",)  # eval subset re-planted into the pool (~1/2)
DECON_TAU = 0.9  # max-cosine >= tau => contaminated
DECON_PLANT_OFFSET = 1_000_000  # planted ids never collide with real
DECON_RECALL_FLOOR = 0.8  # planted-duplicate recall the report asserts
DECON_PERTURB = 0.05  # element scaling amplitude for planted copies


@register(
    "curation_semantic_decontam",
    oracle=f"""
WITH ev AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
    FROM embeddings
    WHERE vec_id < {DECON_EVAL_ID_CAP}
      AND {md5_quarter_sql("vec_id", DECON_EVAL_HEX)}
),
pool_real AS (
    SELECT e.vec_id, d.source,
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS emb
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    WHERE NOT (e.vec_id < {DECON_EVAL_ID_CAP}
               AND {md5_quarter_sql("e.vec_id", DECON_EVAL_HEX)})
),
planted AS (
    SELECT vec_id + {DECON_PLANT_OFFSET} AS vec_id,
           '_planted' AS source,
           list_transform(range(1, len(emb) + 1),
               i -> emb[i]
                    * (1.0 + {DECON_PERTURB} * (((i - 1) % 3) - 1))) AS emb
    FROM ev WHERE {md5_quarter_sql("vec_id", DECON_PLANT_HEX)}
),
pool AS (
    SELECT * FROM pool_real UNION ALL SELECT * FROM planted
),
pu AS (
    SELECT vec_id, source, list_transform(emb, x -> x / nrm) AS u
    FROM (SELECT vec_id, source, emb,
                 sqrt(list_sum(list_transform(emb, y -> y * y))) AS nrm
          FROM pool)
),
eu AS (
    SELECT vec_id AS eval_id, list_transform(emb, x -> x / nrm) AS u
    FROM (SELECT vec_id, emb,
                 sqrt(list_sum(list_transform(emb, y -> y * y))) AS nrm
          FROM ev)
),
per_doc AS (
    SELECT p.vec_id, p.source,
           MAX(ROUND(list_sum(list_transform(range(1, len(p.u) + 1),
               i -> p.u[i] * e.u[i])), 6)) AS max_cos
    FROM pu p CROSS JOIN eu e
    GROUP BY p.vec_id, p.source
),
report AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_pool,
           CAST(SUM(CASE WHEN max_cos >= {DECON_TAU} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           {portable_round_sql(
               "CAST(SUM(CASE WHEN max_cos >= " + str(DECON_TAU)
               + " THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)", 6)}
               AS contamination_rate
    FROM per_doc GROUP BY source
)
SELECT source, n_pool, n_contaminated, contamination_rate,
       (source <> '_planted'
        OR contamination_rate >= {DECON_RECALL_FLOOR}) AS recall_ok
FROM report ORDER BY source
""",
    tags=("curation", "contamination", "similarity", "embedding"),
)
def curation_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set decontamination report: per source, the count
    and share of pool documents whose embedding has max cosine >=
    {DECON_TAU} against the held-out eval split (md5 prefix in
    {DECON_EVAL_HEX}), plus the planted-near-duplicate audit — eval
    vectors with md5 prefix in {DECON_PLANT_HEX} re-enter the pool
    under source '_planted' with a deterministic element-wise
    perturbation (factors 1 +/- {DECON_PERTURB} by index mod 3, so the
    copy's cosine to its origin exceeds 0.95/1.05 for any vector), and
    recall_ok asserts the '_planted' contamination_rate — the
    detector's recall on known positives — meets
    {DECON_RECALL_FLOOR}.

    Scale shape: the eval split plays the role of a fixed external
    benchmark set — pinned to the first {DECON_EVAL_ID_CAP} ids so it
    stays CONSTANT as the corpus grows (a benchmark never scales with
    the training pool) — so it is unit-normalized once and BROADCAST; the pool is scanned exactly once and the
    max-cosine reduces map-side (partial MAX under the cross), so the
    only shuffle is the |sources|-row final rollup: no pool-sized
    state ever moves. Cost is O(|pool| x |eval|) dot folds in
    whole-stage codegen, the brute-force arm of the ANN family; when
    the eval set outgrows broadcast, the same report runs against the
    IVF-routed arm (plans/similarity_ivfpq.py) with identical
    semantics minus the exactness guarantee. The planted audit adds
    |eval|/2 constant rows. Reference behavior: none — the reference
    (/root/reference/target_iceberg/sinks.py) has no query surface;
    this extends the curation suite per SURVEY.md §2B."""
    emb = load_table(spark, sf_dir, "embeddings")
    # The POOL side carries the query's dominant compute — |pool| x
    # |eval| dot folds fused onto the scan stage — and this query never
    # samples per partition (the reason embeddings is normally excluded
    # from fanout), so the pool scan fans out; the eval side stays
    # un-fanned (it is a broadcast build of ~|eval| rows).
    emb_pool = load_table(spark, sf_dir, "embeddings", fanout=True)
    docs = load_table(spark, sf_dir, "documents")

    is_eval = (F.col("vec_id") < DECON_EVAL_ID_CAP) & md5_quarter(
        F.col("vec_id"), DECON_EVAL_HEX
    )
    to_double = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    ev = emb.where(is_eval).select(
        "vec_id", to_double("embedding").alias("emb")
    )

    pool_real = (
        emb_pool.where(~is_eval)
        .join(docs.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id")
        .select("vec_id", "source", to_double("embedding").alias("emb"))
    )
    planted = ev.where(md5_quarter(F.col("vec_id"), DECON_PLANT_HEX)).select(
        (F.col("vec_id") + DECON_PLANT_OFFSET).alias("vec_id"),
        F.lit("_planted").alias("source"),
        F.transform(
            "emb",
            lambda x, i: x
            * (F.lit(1.0) + F.lit(DECON_PERTURB) * (i % 3 - 1).cast("double")),
        ).alias("emb"),
    )
    pool = pool_real.unionByName(planted)

    def unit(df: DataFrame, out: str) -> DataFrame:
        nrm = F.sqrt(
            F.aggregate("emb", F.lit(0.0), lambda acc, v: acc + v * v)
        )
        return df.withColumn("_nrm", nrm).withColumn(
            out, F.transform("emb", lambda x: x / F.col("_nrm"))
        )

    pu = unit(pool, "u").select("vec_id", "source", "u")
    eu = unit(ev, "eu").select(F.col("vec_id").alias("eval_id"), "eu")

    dot = F.round(
        F.aggregate(
            F.zip_with("u", "eu", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    per_doc = (
        pu.crossJoin(F.broadcast(eu))
        .select("vec_id", "source", dot.alias("cos"))
        .groupBy("vec_id", "source")
        .agg(F.max("cos").alias("max_cos"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pool"),
            F.sum(
                F.when(F.col("max_cos") >= DECON_TAU, 1).otherwise(0)
            ).cast("bigint").alias("n_contaminated"),
        )
        .select(
            "source",
            "n_pool",
            "n_contaminated",
            portable_round(
                F.col("n_contaminated").cast("double") / F.col("n_pool"), 6
            ).alias("contamination_rate"),
        )
        .withColumn(
            "recall_ok",
            (F.col("source") != "_planted")
            | (F.col("contamination_rate") >= DECON_RECALL_FLOOR),
        )
        .orderBy("source")
    )
