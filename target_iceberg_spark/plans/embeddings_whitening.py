"""PCA whitening audit (SURVEY.md §2B embeddings tier, round 10).

emb_isotropy MEASURES how anisotropic the embedding corpus is;
whitening is the FIX — project onto the eigenbasis and rescale each
axis by 1/sqrt(lambda) so the transformed cloud has identity
covariance (Bell & Sejnowski's ZCA lineage; the retrieval-quality
version is Su et al. 2021 "Whitening Sentence Representations",
public). Standard preprocessing before cosine ANN when the encoder
collapsed directions.

Like emb_pca, the eigensolve has no SQL twin, so the registered row
is the HASH-CHECKABLE contract of the transform: each whitened axis
has unit variance (distributed var_samp vs 1.0), axes are
decorrelated (distributed covariance vs 0), and the transform is
centered (distributed mean vs 0). A wrong eigenbasis, a stale mean,
or a missing 1/sqrt(lambda) each flip a boolean and fail the driver
hash; the numeric agreement with numpy stays pinned in tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

WHITEN_K = 2  # whitened axes (matches emb_pca's component count)
WHITEN_VAR_RTOL = 1e-4  # unit-variance tolerance per axis
WHITEN_COV_ATOL = 1e-6  # cross-covariance tolerance
WHITEN_MEAN_ATOL = 1e-9  # centering tolerance


@register(
    "emb_whitening",
    oracle="""
SELECT 0 AS axis, TRUE AS unit_variance, TRUE AS centered,
       TRUE AS decorrelated
UNION ALL
SELECT 1, TRUE, TRUE, TRUE
ORDER BY axis
""",
    tags=("embeddings", "pca", "whitening", "audit"),
)
def emb_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whiten the corpus onto the top-{WHITEN_K} eigenaxes
    (y_j = (x - mu)·v_j / sqrt(lambda_j)) and hash-check the identity
    contract per axis: var_samp(y_j) within {WHITEN_VAR_RTOL} of 1,
    mean(y_j) within {WHITEN_MEAN_ATOL} of 0, cov(y_j, y_j-1) within
    {WHITEN_COV_ATOL} of 0.

    Scale shape (`operators/pca.py`): the fit is the d^2-bounded
    Arrow partial pass + a driver-side d x d eigensolve
    (corpus-size-independent); the whitened scores are {WHITEN_K}
    broadcast codegen fold expressions (no Python in the hot path),
    and the audit is ONE distributed aggregate over them. The
    1/sqrt(lambda) scaling folds into the projection constant, so
    whitening costs exactly what projection costs."""
    import math

    from target_iceberg_spark.operators.pca import fit_pca, project_expr

    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, eigs = fit_pca(emb, "embedding", k=WHITEN_K)
    scores = emb.select(
        *[
            (project_expr("embedding", comps[j], mean) / math.sqrt(float(eigs[j]))).alias(
                f"y_{j}"
            )
            for j in range(WHITEN_K)
        ]
    )
    audit = scores.agg(
        *(
            [F.var_samp(f"y_{j}").alias(f"v_{j}") for j in range(WHITEN_K)]
            + [F.avg(f"y_{j}").alias(f"m_{j}") for j in range(WHITEN_K)]
            + [
                F.covar_samp(f"y_{j}", f"y_{j - 1}").alias(f"c_{j}")
                for j in range(1, WHITEN_K)
            ]
        )
    )
    axes = spark.createDataFrame([(j,) for j in range(WHITEN_K)], "axis int")
    v_j = F.lit(None).cast("double")
    m_j = F.lit(None).cast("double")
    c_j = F.lit(0.0)
    for j in range(WHITEN_K):
        v_j = F.when(F.col("axis") == j, F.col(f"v_{j}")).otherwise(v_j)
        m_j = F.when(F.col("axis") == j, F.col(f"m_{j}")).otherwise(m_j)
        if j >= 1:
            c_j = F.when(F.col("axis") == j, F.col(f"c_{j}")).otherwise(c_j)
    return (
        axes.crossJoin(F.broadcast(audit))
        .select(
            "axis",
            (F.abs(v_j - 1.0) <= F.lit(WHITEN_VAR_RTOL)).alias("unit_variance"),
            (F.abs(m_j) <= F.lit(WHITEN_MEAN_ATOL)).alias("centered"),
            (F.abs(c_j) <= F.lit(WHITEN_COV_ATOL)).alias("decorrelated"),
        )
        .orderBy("axis")
    )
