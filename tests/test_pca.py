"""PCA operator (`operators/pca.py`): the distributed Gram/power-
iteration fit must reproduce numpy's exact eigendecomposition, and the
registered rows-only query's distributed projection variance must
reproduce the driver-side eigenvalues (its built-in audit)."""

from __future__ import annotations

import numpy as np
import pytest

from target_iceberg_spark.operators.pca import fit_pca
from target_iceberg_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def fitted(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    mean, comps, eigs = fit_pca(emb, "embedding", k=2)
    x = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    return mean, comps, eigs, x


def test_mean_matches_numpy(fitted):
    mean, _, _, x = fitted
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=0, atol=1e-10)


def test_top_eigenvalues_match_numpy(fitted):
    _, _, eigs, x = fitted
    cov = np.cov(x, rowvar=False, ddof=1)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(eigs, w[:2], rtol=1e-6)
    assert eigs[0] >= eigs[1] > 0


def test_components_span_numpy_eigenvectors(fitted):
    _, comps, _, x = fitted
    cov = np.cov(x, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    for j in range(2):
        # eigenvectors are sign-ambiguous: compare |cosine| to 1
        align = abs(float(comps[j] @ v[:, order[j]]))
        assert align > 1 - 1e-8, f"component {j} misaligned: {align}"
    # orthonormality of the returned basis
    np.testing.assert_allclose(comps @ comps.T, np.eye(2), atol=1e-10)


def test_query_audit_reproduces_eigenvalues(spark, sf_oracle):
    """The round-9 audit-row form must assert every invariant TRUE;
    the underlying eigenvalue/projection-variance agreement is checked
    DIRECTLY against the operator (the query now folds it to the
    matches_proj_var boolean the driver hashes)."""
    import pyspark.sql.functions as F

    from target_iceberg_spark.operators.pca import fit_pca, project_expr
    from target_iceberg_spark.plans import all_specs
    from target_iceberg_spark.sources.tables import load_table

    rows = all_specs()["emb_pca"].builder(spark, sf_oracle).collect()
    assert [r["component"] for r in rows] == [0, 1]
    for r in rows:
        assert r["unit_norm"] and r["orthogonal_to_prev"]
        assert r["matches_proj_var"] and r["eig_nonincreasing"]
    # the numeric agreement itself, straight from the operator
    emb = load_table(spark, sf_oracle, "embeddings")
    mean, comps, eigs = fit_pca(emb, "embedding", k=2)
    assert eigs[0] > eigs[1] > 0
    audit = emb.select(
        *[
            project_expr("embedding", comps[j], mean).alias(f"s{j}")
            for j in range(2)
        ]
    ).agg(*[F.var_samp(f"s{j}").alias(f"v{j}") for j in range(2)]).collect()[0]
    for j in range(2):
        assert audit[f"v{j}"] == pytest.approx(float(eigs[j]), rel=1e-6)
