"""Johnson-Lindenstrauss random projection of the embedding column
(SURVEY.md §2B embeddings tier, round-5 post-window).

The OBLIVIOUS dimensionality reduction: a fixed ±1 sign matrix
(Achlioptas 2001, public) scaled by 1/sqrt(k) approximately preserves
pairwise L2 distances with no training pass at all — the counterpart
to emb_pca (data-dependent, driver-side eigensolve, rows-only check).
Because the matrix here is derived from md5 (identical in Spark and
DuckDB), the whole projection AND its distance-distortion audit are
hash-checkable, making this the engine's only exactly-verifiable
dimensionality reduction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

JL_DIMS = 16  # target dimensionality (from 64)
JL_PROBES = 10  # audit pairs among the first N vectors


@register(
    "emb_jl_projection",
    oracle=f"""
WITH m AS (
    SELECT i, j,
           CASE WHEN substr(md5(CAST(i AS VARCHAR) || '_'
                                || CAST(j AS VARCHAR)), 1, 1)
                     IN ('0','1','2','3','4','5','6','7')
                THEN 1.0 ELSE -1.0 END AS sgn
    FROM (SELECT unnest(range(1, 65)) AS i),
         (SELECT unnest(range(1, {JL_DIMS} + 1)) AS j)
),
vals AS (
    SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
           embedding AS emb
    FROM embeddings WHERE vec_id < {JL_PROBES}
),
expl AS (
    SELECT vec_id, i, CAST(emb[i] AS DOUBLE) AS val FROM vals
),
proj AS (
    SELECT e.vec_id, m.j,
           ROUND(SUM(e.val * m.sgn) / sqrt({JL_DIMS}), 6) AS p
    FROM expl e JOIN m ON e.i = m.i
    GROUP BY e.vec_id, m.j
),
proj_d AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           SUM((a.p - b.p) * (a.p - b.p)) AS pd2
    FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
),
orig_d AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           SUM((a.val - b.val) * (a.val - b.val)) AS od2
    FROM expl a JOIN expl b ON a.i = b.i AND a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
)
SELECT vec_a, vec_b,
       ROUND(sqrt(od2), 4) AS orig_dist,
       ROUND(sqrt(pd2), 4) AS proj_dist,
       ROUND(sqrt(pd2) / sqrt(od2), 4) AS dist_ratio
FROM proj_d JOIN orig_d USING (vec_a, vec_b)
ORDER BY vec_a, vec_b
""",
    tags=("embeddings", "projection", "jl"),
)
def emb_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64 -> {JL_DIMS} dims with a deterministic
    md5-derived ±1/sqrt(k) matrix, audited by the pairwise distance
    ratio over the first {JL_PROBES} vectors — the report a pipeline
    reads to decide whether the compressed index is usable (JL says
    the ratios concentrate near 1; the audit SHOWS the spread at
    k={JL_DIMS}).

    Scale shape: the projection is posexplode -> equi-join against the
    64x{JL_DIMS}-row broadcast matrix -> one combinable (vec, j) sum —
    a linear pass needing NO training and NO driver-side linear
    algebra (contrast emb_pca's d²-bounded Gram collect), so it
    parallelizes over any corpus size; the audit restricts to probe
    pairs only. Projected coordinates round to 6 before the distance
    stage so pair sums are engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = (
        spark.range(1, 65)
        .select(F.col("id").cast("int").alias("i"))
        .select(
            "i",
            F.explode(F.sequence(F.lit(1), F.lit(JL_DIMS))).alias("j"),
        )
        .select(
            "i",
            "j",
            F.when(
                F.substring(
                    F.md5(F.concat_ws("_", F.col("i"), F.col("j"))), 1, 1
                ).isin(*"01234567"),
                1.0,
            )
            .otherwise(-1.0)
            .alias("sgn"),
        )
    )
    expl = (
        emb.where(F.col("vec_id") < JL_PROBES)
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("i"),
            F.col("v").cast("double").alias("val"),
        )
    )
    proj = (
        expl.join(F.broadcast(m), "i")
        .groupBy("vec_id", "j")
        .agg(
            F.round(
                F.sum(F.col("val") * F.col("sgn")) / F.sqrt(F.lit(JL_DIMS)),
                6,
            ).alias("p")
        )
    )
    pa, pb = proj.alias("a"), proj.alias("b")
    proj_d = (
        pa.join(
            pb,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .agg(
            F.sum(
                (F.col("a.p") - F.col("b.p")) * (F.col("a.p") - F.col("b.p"))
            ).alias("pd2")
        )
    )
    ea, eb = expl.alias("a"), expl.alias("b")
    orig_d = (
        ea.join(
            eb,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .agg(
            F.sum(
                (F.col("a.val") - F.col("b.val"))
                * (F.col("a.val") - F.col("b.val"))
            ).alias("od2")
        )
    )
    return (
        proj_d.join(orig_d, ["vec_a", "vec_b"])
        .select(
            "vec_a",
            "vec_b",
            F.round(F.sqrt("od2"), 4).alias("orig_dist"),
            F.round(F.sqrt("pd2"), 4).alias("proj_dist"),
            F.round(F.sqrt("pd2") / F.sqrt("od2"), 4).alias("dist_ratio"),
        )
        .orderBy("vec_a", "vec_b")
    )
