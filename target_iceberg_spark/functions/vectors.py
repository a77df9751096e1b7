"""Vector math over array<float> embedding columns.

Pure built-in higher-order functions (zip_with / aggregate) — the
whole computation stays in the JVM inside codegen; no Python UDF in
the hot path. Elements are cast to double BEFORE multiply/accumulate
so results are engine-portable (float32 accumulation is not):
left-to-right sequential folds match DuckDB's list_* functions on
DOUBLE[] casts.

At 100 TB scale brute-force cosine is O(N·d) per probe — fine for one
probe (one pass), quadratic for all-pairs. The all-pairs/dedup paths
must block first (see operators/ and plans/dedup.py); this module only
provides the per-pair kernels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision.

    Length-mismatched vectors yield NULL (zip_with pads with null and
    null poisons the fold) rather than erroring — callers filtering on
    the result silently drop such rows; add an explicit size guard
    upstream if corrupt embeddings must be surfaced loudly."""
    a, b = _as_col(a), _as_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_norm(a: Column | str) -> Column:
    a = _as_col(a)
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity = dot / sqrt(|a|^2 * |b|^2)."""
    return dot(a, b) / F.sqrt(sq_norm(a) * sq_norm(b))


def l2_dist(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance via the expanded form |a|^2 - 2a.b + |b|^2
    (one fold per term, no per-element subtraction array). The expansion
    can go fractionally NEGATIVE under floating-point cancellation when
    a ~= b (true dist^2 ~1e-18 rounds to ~-1e-14), and sqrt(negative) is
    NaN — which sorts LAST ascending, silently dropping a near-duplicate
    best match from any top-k. Clamp at zero before the sqrt."""
    return F.sqrt(
        F.greatest(sq_norm(a) - 2 * dot(a, b) + sq_norm(b), F.lit(0.0))
    )


def cosine_sql(a: str, b: str) -> str:
    """DuckDB SQL that mirrors :func:`cosine` OPERATION-FOR-OPERATION —
    same element order, same double promotions, same dot/sqrt(na*nb)
    combination — so oracle values are bit-identical, not merely close.
    (DuckDB's built-in list_cosine_similarity normalizes differently at
    the ulp level, which can flip a rounded 6th decimal at a boundary.)
    Keep in sync with cosine()/dot()/sq_norm() above."""

    def _sum(expr: str, n_of: str) -> str:
        return (
            f"list_sum(list_transform(range(1, len({n_of}) + 1), i -> {expr}))"
        )

    dot_sql = _sum(f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)", a)
    na_sql = _sum(f"CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)", a)
    nb_sql = _sum(f"CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)", b)
    return f"({dot_sql} / sqrt({na_sql} * {nb_sql}))"


def sign_bucket(a: Column | str, n_components: int = 2, offset: int = 0) -> Column:
    """Coarse deterministic bucket from the signs of ``n_components``
    vector components starting at ``offset`` — a 1-bit-per-dim random-
    hyperplane LSH with axis-aligned planes. Nearly-parallel vectors
    (near-dups) land in the same bucket unless a used component is
    ~0; used to block quadratic pair generation. Distinct offsets give
    independent hash tables for banded (OR-amplified) blocking."""
    a = _as_col(a)
    bucket = F.lit(0)
    for i in range(n_components):
        bit = F.when(F.element_at(a, offset + i + 1) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def sign_bucket_sql(a: str, n_components: int = 2, offset: int = 0) -> str:
    """DuckDB SQL mirroring :func:`sign_bucket` bit-for-bit (1-based
    list indexing, same bit order) so blocked joins oracle-check."""
    terms = []
    for i in range(n_components):
        weight = 1 << (n_components - 1 - i)
        terms.append(
            f"(CASE WHEN {a}[{offset + i + 1}] > 0 THEN {weight} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"
