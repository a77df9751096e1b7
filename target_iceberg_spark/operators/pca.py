"""PCA for embedding columns — distributed Gram matrix, driver-side
exact eigensolve, codegen projection.

The dimensionality-reduction step an embedding pipeline runs before
ANN indexing or visualization. Spark-first decomposition of the
classic algorithm:

  1. ONE Arrow-batched pass (mapInPandas) computes per-batch partials
     (count, sum vector, X^T X Gram matrix) — a d×d-bounded summary
     per batch regardless of row count, the same bounded-partials
     shape as `operators/pq.py`'s codebook fit.
  2. The driver combines partials (#partitions × d² doubles — tiny),
     forms the covariance, and eigendecomposes it EXACTLY
     (numpy.linalg.eigh — the d×d problem is corpus-size-independent,
     and exact eigh beats power iteration outright on the
     near-degenerate spectra real embedding corpora have, where the
     λ2/λ1 ratio makes power iteration arbitrarily slow). Like the
     k-means / IVF / PQ fits, the model is a bounded driver-side
     constant.
  3. Projection back over the corpus is a broadcast of k×d literals
     into codegen zip_with/aggregate folds (`functions/vectors.py`) —
     no Python in the projection path.

The reference (SidetrekAI/target-iceberg, write-only ingestion shim)
has no vector surface; engine extension, same family as
`operators/ivf.py` / `operators/pq.py`.

Determinism: eigh is deterministic for a given covariance; signs are
fixed by the largest-magnitude coordinate. Partial sums combine in
partition order, so eigenvalues are stable to ~1e-12 relative across runs (the
registered query rounds well inside that); exact SQL reproduction is
not possible (eigensolve), so the query is rows-only by design with a
numpy-equivalence unit test.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from target_iceberg_spark.bounded import bounded_collect

if TYPE_CHECKING:  # pragma: no cover
    import numpy as np


def gram_partials(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-batch (n, sum, flattened X^T X) partials — one small row per
    Arrow batch; the only data that ever leaves the executors."""
    import pandas as pd  # executor-side import, kept local for pickling

    def partials(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    return emb.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>"
    )


def fit_pca(
    emb: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
):
    """Fit top-``k`` principal components. Returns
    ``(mean, components, eigenvalues)`` — numpy arrays of shape (d,),
    (k, d), (k,). The collect is bounded: one (d²+d+1)-double row per
    Arrow batch."""
    import numpy as np

    rows = bounded_collect(
        gram_partials(emb, vec_col),
        cap=100_000,
        why="one (d^2+d+1)-double moment row per Arrow batch "
        "(partition-partials class, corpus-size independent per batch)",
        structural=False,
    )
    if not rows:
        raise ValueError("fit_pca: empty input")
    d = len(rows[0]["s"])
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("fit_pca: need at least 2 vectors")
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)

    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = np.zeros((k, d))
    eigs = np.zeros(k)
    for j, idx in enumerate(order):
        vec = v[:, idx]
        if vec[np.argmax(np.abs(vec))] < 0:  # deterministic sign convention
            vec = -vec
        comps[j] = vec
        eigs[j] = float(w[idx])
    return mean, comps, eigs


def project_expr(vec_col: str, component: "np.ndarray", mean: "np.ndarray") -> Column:
    """Centered projection score dot(x - mean, v) as the codegen-safe
    ``dot(x, v) - dot(mean, v)`` — the mean term folds to a constant,
    so the per-row work is ONE zip_with/aggregate fold."""
    from target_iceberg_spark.functions.vectors import dot

    v_lit = F.array(*[F.lit(float(c)) for c in component])
    offset = float(mean @ component)
    return dot(F.col(vec_col), v_lit) - F.lit(offset)
