"""Distributed embedding-column analytics beyond similarity search:
nearest-centroid classification (the Rocchio classifier), the building
block of embedding-space corpus diagnostics — cluster purity checks,
label-noise detection, and domain assignment in training-data
pipelines.

Spark-first shape: centroids are a BOUNDED table (labels x dims), so
they reduce map-side via posexplode + avg, re-assemble into arrays,
and BROADCAST; every vector then scores all centroids in one
whole-stage-codegen pass over zip_with/aggregate folds — no N x dims
x labels shuffle, no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "emb_centroid_classify",
    oracle="""
WITH idx AS (
    SELECT vec_id, label, embedding,
           unnest(range(1, len(embedding) + 1)) AS pos
    FROM embeddings
),
pos AS (
    SELECT vec_id, label, pos, embedding[pos] AS val FROM idx
),
cent AS (
    SELECT label AS clabel, pos, AVG(val) AS cval
    FROM pos GROUP BY label, pos
),
dist AS (
    SELECT p.vec_id, p.label, c.clabel,
           ROUND(SUM((p.val - c.cval) * (p.val - c.cval)), 6) AS d2
    FROM pos p JOIN cent c ON p.pos = c.pos
    GROUP BY p.vec_id, p.label, c.clabel
),
pred AS (
    SELECT vec_id, label, clabel,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
    FROM dist
)
SELECT label, clabel AS pred, CAST(COUNT(*) AS BIGINT) AS n
FROM pred WHERE rn = 1
GROUP BY label, clabel
ORDER BY label, pred
""",
    tags=("embeddings", "classify"),
)
def emb_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification confusion matrix: fit
    per-label centroids over the embedding column, assign every vector
    to its nearest centroid by squared L2, and count (true label,
    predicted label) pairs.

    Scale shape: the centroid fit is a map-side-combinable avg over
    posexplode (labels x dims rows total — bounded, not corpus-sized);
    the fitted centroid-array table (10 rows here, always <= labels)
    broadcasts, and scoring is one codegen stage per vector computing
    all label distances via zip_with + aggregate folds — work is
    O(N * labels * dims) FLOPs with zero extra shuffle; the argmin is a
    grouped ``min_by(clabel, struct(d2, clabel))`` — a map-side
    COMBINABLE aggregate (partial min per partition, merge in the
    reduce), one shuffle cheaper than the row_number-window shape it
    replaces and with no per-vector window sort.
    Distances are rounded to 6 before the argmin on BOTH engines so
    ulp-level sum-order noise cannot flip a ranking, and exact rounded
    ties break on the lower label — the argmin is engine-portable even
    on the synthetic embeddings, whose labels are only weakly
    cluster-correlated (the confusion matrix is dense; that is a
    property of the data, not the operator)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select("label", F.posexplode("embedding").alias("p", "v"))
    cent = pos.groupBy(F.col("label").alias("clabel"), "p").agg(
        F.avg("v").alias("cv")
    )
    cent_arr = cent.groupBy("clabel").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "cv"))), lambda s: s["cv"]
        ).alias("cvec")
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with("embedding", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    scored = (
        emb.select("vec_id", "label", "embedding")
        .crossJoin(F.broadcast(cent_arr))
        .select("vec_id", "label", "clabel", d2.alias("d2"))
    )
    # struct ordering is lexicographic, so min_by over (d2, clabel)
    # reproduces the ROW_NUMBER(ORDER BY d2, clabel)=1 tie-break exactly
    pred = scored.groupBy("vec_id", "label").agg(
        F.min_by("clabel", F.struct("d2", "clabel")).alias("pred")
    )
    return (
        pred.groupBy("label", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("label", "pred")
    )


KMEANS_K = 8  # seeds = the first K vec_ids (deterministic, oracle-shared)


@register(
    "emb_kmeans",
    oracle=f"""
WITH pos AS (
    SELECT vec_id, pos, embedding[pos] AS val
    FROM (SELECT vec_id, embedding,
                 unnest(range(1, len(embedding) + 1)) AS pos
          FROM embeddings)
),
c1 AS (
    SELECT vec_id AS cid, pos, val AS cval FROM pos WHERE vec_id < {KMEANS_K}
),
d1 AS (
    SELECT p.vec_id, c.cid,
           ROUND(SUM((p.val - c.cval) * (p.val - c.cval)), 6) AS d2
    FROM pos p JOIN c1 c ON p.pos = c.pos
    GROUP BY p.vec_id, c.cid
),
m1 AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d1
    ) WHERE rn = 1
),
c2 AS (
    SELECT m1.cid, p.pos, AVG(p.val) AS cval
    FROM pos p JOIN m1 ON p.vec_id = m1.vec_id
    GROUP BY m1.cid, p.pos
),
d2t AS (
    SELECT p.vec_id, c.cid,
           ROUND(SUM((p.val - c.cval) * (p.val - c.cval)), 6) AS d2
    FROM pos p JOIN c2 c ON p.pos = c.pos
    GROUP BY p.vec_id, c.cid
),
a2 AS (
    SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d2t
    ) WHERE rn = 1
)
SELECT cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(SUM(d2), 4) AS inertia
FROM a2
GROUP BY cid
ORDER BY cluster_id
""",
    tags=("embeddings", "clustering"),
)
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means over the embedding column (two Lloyd
    iterations, deterministic seeding with the first K vectors) — the
    corpus-domain-discovery / coarse-quantizer-fit primitive of an
    embedding pipeline, expressed entirely in DataFrame ops so it is
    oracle-checkable (MLlib's KMeans uses seeded RNG init that SQL
    cannot reproduce; fixing seeds = vec_id < K makes every step
    deterministic and engine-portable).

    Scale shape per iteration: centroids are a bounded K x dims table
    — broadcast; assignment is one codegen zip_with/aggregate pass per
    vector (no shuffle); the centroid refit is a map-side-combinable
    avg over posexplode keyed by (cluster, dim) — K x dims output
    rows. The argmin is a grouped min_by, never a window. Per
    iteration cost is one broadcast + one combinable aggregate —
    exactly how IVF's quantizer (operators/ivf.py) trains at scale,
    here unrolled twice; distances round to 6 before each argmin on
    both engines so ulp-level avg noise cannot flip an assignment.
    Output: per-cluster size + inertia after the second assignment."""
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select("vec_id", F.posexplode("embedding").alias("p", "v"))

    def to_arrays(cent_pos: DataFrame) -> DataFrame:
        return cent_pos.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "cv"))), lambda s: s["cv"]
            ).alias("cvec")
        )

    def assign(cent_arr: DataFrame) -> DataFrame:
        d2 = F.round(
            F.aggregate(
                F.zip_with("embedding", "cvec", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        scored = (
            emb.select("vec_id", "embedding")
            .crossJoin(F.broadcast(cent_arr))
            .select("vec_id", "cid", d2.alias("d2"))
        )
        # min over the (d2, cid) struct == ROW_NUMBER(ORDER BY d2, cid)=1
        return scored.groupBy("vec_id").agg(
            F.min(F.struct("d2", "cid")).alias("_m")
        ).select("vec_id", F.col("_m.cid").alias("cid"), F.col("_m.d2").alias("d2"))

    seeds = emb.where(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.posexplode("embedding").alias("p", "cv")
    )
    a1 = assign(to_arrays(seeds))
    refit = (
        pos.join(a1.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "p")
        .agg(F.avg("v").alias("cv"))
    )
    a2 = assign(to_arrays(refit))
    return (
        a2.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.sum("d2"), 4).alias("inertia"),
        )
        .orderBy("cluster_id")
    )


@register(
    "emb_quantize_int8",
    # floor(x + 0.5) instead of round(): explicit half-up in BOTH
    # engines, so the int8 codes are deterministic; only the per-vector
    # MSE (a 64-term double sum) needs a rounding collapse
    oracle="""
WITH d AS (
    SELECT vec_id, t.i AS dim, CAST(embedding[t.i + 1] AS DOUBLE) AS v
    FROM embeddings, UNNEST(range(0, len(embedding))) t(i)
),
stats AS (
    SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM d GROUP BY dim
),
coded AS (
    SELECT d.vec_id, d.v, s.mn, s.mx,
           CASE WHEN s.mx = s.mn THEN 0
                ELSE CAST(FLOOR((d.v - s.mn) / (s.mx - s.mn) * 255 + 0.5)
                          AS BIGINT) - 128
           END AS code
    FROM d JOIN stats s ON s.dim = d.dim
)
SELECT vec_id,
       CAST(COUNT(*) AS INT) AS n_dims,
       CAST(SUM(code) AS BIGINT) AS code_sum,
       ROUND(AVG(POW(v - (CASE WHEN mx = mn THEN mn
                               ELSE (code + 128) / 255.0 * (mx - mn) + mn
                          END), 2)), 9) AS recon_mse
FROM coded
GROUP BY vec_id
ORDER BY vec_id
""",
    tags=("embedding", "quantization"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension scalar int8 quantization of the embedding corpus —
    the 4× storage/bandwidth cut every vector store applies before ANN
    at scale. Per-dim min/max are ONE combinable 64-row aggregate,
    broadcast back onto the posexploded values; codes are explicit
    half-up fixed-point (floor(x+0.5), bit-identical across engines);
    the audit output is per-vector code checksum + reconstruction MSE.
    Scale shape: narrow (vec_id, dim, v) flow, no window, no self-join;
    the only shuffles are the 64-row stats aggregate and the per-vector
    regroup — both map-side combinable. At 100 TB the stats join stays
    a broadcast (64 rows regardless of corpus size)."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "_vf")
    ).select("vec_id", "dim", F.col("_vf").cast("double").alias("v"))
    stats = d.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    coded = d.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "v",
        "mn",
        "mx",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.floor(
                (F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255
                + 0.5
            ).cast("bigint")
            - 128
        )
        .alias("code"),
    )
    dequant = F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
        (F.col("code") + 128) / 255.0 * (F.col("mx") - F.col("mn")) + F.col("mn")
    )
    return (
        coded.groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_dims"),
            F.sum("code").alias("code_sum"),
            F.round(F.avg(F.pow(F.col("v") - dequant, 2)), 9).alias("recon_mse"),
        )
        .orderBy("vec_id")
    )


PCA_VAR_RTOL = 1e-4  # eigenvalue vs distributed projection variance
PCA_ORTHO_ATOL = 1e-9  # orthonormality of the eigenbasis


@register(
    "emb_pca",
    oracle="""
SELECT 0 AS component, TRUE AS unit_norm, TRUE AS orthogonal_to_prev,
       TRUE AS matches_proj_var, TRUE AS eig_nonincreasing
UNION ALL
SELECT 1, TRUE, TRUE, TRUE, TRUE
ORDER BY component
""",
    tags=("embeddings", "pca", "audit"),
)
def emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal components of the embedding corpus, reduced to
    a HASH-CHECKABLE invariant audit row per component (round 9;
    previously rows-only): unit norm and mutual orthogonality of the
    eigenbasis (driver-side d-bounded dot products, atol
    {PCA_ORTHO_ATOL}), agreement of each driver eigenvalue with the
    DISTRIBUTED var_samp of its projection scores (rtol
    {PCA_VAR_RTOL} — a fit/projection skew flips this to false and
    fails the driver hash), and non-increasing eigenvalue order. The
    eigensolve itself has no SQL twin; the numeric equivalence to
    numpy.linalg.eigh stays pinned in tests/test_pca.py.

    Scale shape (`operators/pca.py`): the covariance never
    materializes per row — ONE Arrow-batched pass emits d²-bounded
    (count, sum, X^T X) partials per batch, the driver combines them
    and eigendecomposes (a d×d problem, corpus-size-independent), and
    the projection back over the corpus is k broadcast codegen
    zip_with folds."""
    import numpy as np

    from target_iceberg_spark.operators.pca import fit_pca, project_expr

    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, eigs = fit_pca(emb, "embedding", k=2)
    scores = emb.select(
        *[
            project_expr("embedding", comps[j], mean).alias(f"score_{j}")
            for j in range(len(eigs))
        ]
    )
    audit = scores.agg(
        *[F.var_samp(f"score_{j}").alias(f"v_{j}") for j in range(len(eigs))]
    )
    C = np.asarray(comps, dtype=np.float64)
    rows = [
        (
            j,
            float(eigs[j]),
            bool(abs(float(C[j] @ C[j]) - 1.0) <= PCA_ORTHO_ATOL),
            bool(
                j == 0
                or abs(float(C[j] @ C[j - 1])) <= PCA_ORTHO_ATOL
            ),
            bool(j == 0 or float(eigs[j]) <= float(eigs[j - 1])),
        )
        for j in range(len(eigs))
    ]
    eig_df = spark.createDataFrame(
        rows,
        "component int, eigenvalue double, unit_norm boolean,"
        " orthogonal_to_prev boolean, eig_nonincreasing boolean",
    )
    # generic over k: component j reads audit column v_j (a hardcoded
    # v_0/v_1 pair would silently misreport if k ever changed)
    proj_var = F.lit(None).cast("double")
    for j in range(len(eigs)):
        proj_var = F.when(F.col("component") == j, F.col(f"v_{j}")).otherwise(
            proj_var
        )
    return (
        eig_df.crossJoin(F.broadcast(audit))
        .select(
            "component",
            "unit_norm",
            "orthogonal_to_prev",
            (
                F.abs(proj_var - F.col("eigenvalue"))
                <= F.lit(PCA_VAR_RTOL) * F.col("eigenvalue")
            ).alias("matches_proj_var"),
            "eig_nonincreasing",
        )
        .orderBy("component")
    )
