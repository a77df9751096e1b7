"""Matryoshka recall-vs-dimension curve (SURVEY.md §2B similarity
north star, round 7, post-window).

sim_matryoshka_prefix audits ONE prefix width for one probe; this
measures the whole operating curve — recall@k of prefix-dimension
scoring against full-dimension truth for d' ∈ {8, 16, 32}, averaged
over a probe panel — the table an embedding team reads to pick the
cheap-arm width (Kusupati et al., NeurIPS 2022, fig. 4 reduced to a
query). Same measured-tuning-curve discipline as dedup_lsh_band_sweep
(LSH bands) and sim_ann_quality (index arms).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.vectors import cosine_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

MC_PREFIXES = (8, 16, 32)
MC_PROBES = 8  # probe panel: vec_id < MC_PROBES
MC_K = 10


def _arm_sql(d: int) -> str:
    return (
        f"ROUND({cosine_sql(f'c.embedding[1:{d}]', f'p.embedding[1:{d}]')}, 9)"
    )


@register(
    "sim_matryoshka_curve",
    oracle=f"""
WITH scored AS (
    SELECT p.vec_id AS probe_id, c.vec_id,
           {", ".join(f"{_arm_sql(d)} AS s{d}" for d in MC_PREFIXES)},
           ROUND({cosine_sql('c.embedding', 'p.embedding')}, 9) AS s64
    FROM embeddings c
    JOIN embeddings p ON p.vec_id < {MC_PROBES} AND c.vec_id <> p.vec_id
),
ranked AS (
    SELECT probe_id, vec_id,
           {", ".join(
               f"ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY s{d} DESC, vec_id) <= {MC_K} AS top{d}"
               for d in MC_PREFIXES
           )},
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY s64 DESC, vec_id) <= {MC_K} AS top64
    FROM scored
),
per_probe AS (
    SELECT probe_id,
           {", ".join(
               f"SUM(CASE WHEN top{d} AND top64 THEN 1 ELSE 0 END) / {MC_K}.0 AS r{d}"
               for d in MC_PREFIXES
           )}
    FROM ranked
    GROUP BY probe_id
)
SELECT * FROM (
    {" UNION ALL ".join(
        f"SELECT {d} AS prefix_dims, CAST({MC_PROBES} AS BIGINT) AS n_probes, "
        f"ROUND(AVG(r{d}), 4) AS recall_at_{MC_K} FROM per_probe"
        for d in MC_PREFIXES
    )}
)
ORDER BY prefix_dims
""",
    tags=("similarity", "matryoshka", "tuning"),
)
def sim_matryoshka_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{MC_K} of prefix-dimension cosine against the full
    64-dim exact top-{MC_K}, for prefixes {MC_PREFIXES}, averaged over
    a {MC_PROBES}-probe panel — the dimension-vs-quality operating
    curve that decides the rerank cascade's cheap-arm width. On these
    synthetic uniform vectors the curve rises slowly with d' (the
    honest no-MRL baseline); on Matryoshka-trained embeddings it
    saturates early, and THIS query is how you'd see that.

    Scale shape: the probe panel broadcasts ({MC_PROBES} rows — the
    sim_cosine_topk_batch class); ONE corpus scan computes all four
    sims in the same codegen projection; the four rank windows share
    ONE partitionBy(probe_id) shuffle of (ids + 4 rounded sims) — the
    embedding column itself never shuffles; recalls are combinable
    averages over {MC_PROBES} rows. Rank keys are sims ROUNDED to 9dp
    with vec_id tie-break, so every cut is engine-deterministic."""
    # fanout A/B'd round 13 and REJECTED (0.96x wall but total stage
    # CPU ballooned 2.2 -> 15.7 CPU-s: ~0.5 s fixed per-task
    # broadcast/codegen init across 32 tasks — the sim_reciprocal_knn
    # pathology).
    emb = load_table(spark, sf_dir, "embeddings")
    from target_iceberg_spark.functions.vectors import dot, sq_norm

    # Per-VECTOR squared norms for every prefix width, hoisted out of
    # the per-(vector, probe) scoring expression: cosine() is
    # dot/sqrt(sq_norm*sq_norm), so dividing the pair dot by
    # sqrt(_n{d} * _pn{d}) is the IDENTICAL float expression — each
    # vector's 4 norms compute once instead of once per probe.
    def norms(col: str, prefix: str):
        return [
            sq_norm(F.slice(col, 1, d)).alias(f"{prefix}{d}")
            for d in MC_PREFIXES
        ] + [sq_norm(col).alias(f"{prefix}64")]

    probes = emb.where(F.col("vec_id") < MC_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p"),
        *norms("embedding", "_pn"),
    )
    c = emb.select("vec_id", "embedding", *norms("embedding", "_n"))

    def sim(d: int) -> F.Column:
        a = F.slice("embedding", 1, d) if d != 64 else F.col("embedding")
        b = F.slice("p", 1, d) if d != 64 else F.col("p")
        return F.round(
            dot(a, b) / F.sqrt(F.col(f"_n{d}") * F.col(f"_pn{d}")), 9
        )

    scored = (
        c.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            *[sim(d).alias(f"s{d}") for d in MC_PREFIXES],
            sim(64).alias("s64"),
        )
    )
    def topflag(col: str) -> F.Column:
        w = Window.partitionBy("probe_id").orderBy(
            F.col(col).desc(), F.col("vec_id")
        )
        return (F.row_number().over(w) <= MC_K).alias(f"top_{col}")

    ranked = scored.select(
        "probe_id",
        *[topflag(f"s{d}") for d in MC_PREFIXES],
        topflag("s64"),
    )
    # localCheckpoint: the per-arm report aggregates below each re-ran
    # the whole scored->windows->groupBy chain (three duplicated
    # single-task corpus passes in the round-13 profile); per_probe is
    # MC_PROBES rows, so materializing it makes the corpus pass run
    # once (guide §2.4).
    per_probe = ranked.groupBy("probe_id").agg(
        *[
            (
                F.sum(
                    F.when(
                        F.col(f"top_s{d}") & F.col("top_s64"), 1
                    ).otherwise(0)
                )
                / float(MC_K)
            ).alias(f"r{d}")
            for d in MC_PREFIXES
        ]
    ).localCheckpoint()
    arms = None
    for d in MC_PREFIXES:
        arm = per_probe.agg(
            F.lit(d).alias("prefix_dims"),
            F.count(F.lit(1)).alias("n_probes"),
            F.round(F.avg(f"r{d}"), 4).alias(f"recall_at_{MC_K}"),
        )
        arms = arm if arms is None else arms.unionAll(arm)
    return arms.orderBy("prefix_dims")
