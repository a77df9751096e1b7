"""Batched brute-force retrieval as ONE vectorized GEMM per Arrow
batch (SURVEY.md §2B similarity tier, round-6 post-window).

sim_cosine_topk_batch answers multiple probes with higher-order-
function folds — one JVM-side fold per (row, probe) pair. That is the
right default, but a 1000-probe batch against a wide corpus wants the
matrix form: scores = X · Pᵀ computed by BLAS over an Arrow batch,
which is the standard dense-retrieval inner loop (exactly what FAISS/
ScaNN do per shard, public). This query is that path on Spark:
mapInPandas + numpy GEMM, with per-batch top-k pruning so only
k rows per probe per batch ever leave the executor — and its output
is hash-checked against the same SQL oracle as the fold-based form,
proving the fast path and the declarative path agree row-for-row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.functions.vectors import cosine_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

GEMM_PROBES = 8
GEMM_K = 10

_OUT_SCHEMA = "probe_id bigint, neighbor_id bigint, cos double"


@register(
    "sim_gemm_topk",
    oracle=f"""
SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
       ROUND({cosine_sql('e.embedding', 'p.embedding')}, 6) AS cos
FROM embeddings e
JOIN embeddings p ON p.vec_id < {GEMM_PROBES} AND e.vec_id <> p.vec_id
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY p.vec_id ORDER BY cos DESC, e.vec_id) <= {GEMM_K}
ORDER BY probe_id, cos DESC, neighbor_id
""",
    tags=("similarity", "gemm", "pandas-udf"),
)
def sim_gemm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{GEMM_K} cosine neighbors for {GEMM_PROBES} probe vectors,
    computed as ONE numpy GEMM per Arrow batch inside mapInPandas: the
    probe matrix ({GEMM_PROBES}xd, float64) is closure-broadcast, each
    batch computes scores = X_norm · P_normᵀ with BLAS, rounds to 6,
    and emits only its per-probe top-{GEMM_K} — a window per probe
    then takes the global top-{GEMM_K} over the k·n_batches
    survivors. Per-batch pruning is sound because the per-batch and
    global orderings are identical (rounded cos desc, neighbor id
    asc): the global top-k of a union is contained in the union of
    per-batch top-ks.

    Scale shape: the corpus never shuffles — each executor streams its
    Arrow batches through one float64 GEMM (the 10-100x-over-
    row-at-a-time path the Pandas-UDF tier exists for); what leaves is
    {GEMM_K} rows per probe per batch, so the final window sorts
    O(k·batches) rows per probe, not O(N). Float discipline: all math
    in float64 and rounded at 6 BEFORE ranking on both sides — numpy's
    pairwise summation and the oracle's sequential fold agree to
    ~1e-15 relative, 9 orders below the rounding quantum (verified
    row-for-row by the hash check at sf0.01)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probe_rows = sorted(
        bounded_collect(
            emb.where(F.col("vec_id") < GEMM_PROBES),
            cap=GEMM_PROBES,
            why="unique vec_id < GEMM_PROBES literal",
            structural=False,
        ),
        key=lambda r: r["vec_id"],
    )
    probe_ids = np.array([r["vec_id"] for r in probe_rows], dtype=np.int64)
    P = np.array([r["embedding"] for r in probe_rows], dtype=np.float64)
    P_unit = P / np.sqrt((P * P).sum(axis=1, keepdims=True))

    def gemm_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            X_unit = X / np.sqrt((X * X).sum(axis=1, keepdims=True))
            scores = np.round(X_unit @ P_unit.T, 6)  # (batch, probes)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            out = []
            for j, pid in enumerate(probe_ids):
                col = scores[:, j]
                mask = ids != pid
                cand_ids, cand = ids[mask], col[mask]
                # per-batch top-k under the GLOBAL ordering:
                # (-cos, neighbor_id) lexicographic
                order = np.lexsort((cand_ids, -cand))[:GEMM_K]
                out.append(
                    pd.DataFrame(
                        {
                            "probe_id": pid,
                            "neighbor_id": cand_ids[order],
                            "cos": cand[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = emb.mapInPandas(gemm_batches, schema=_OUT_SCHEMA)
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= GEMM_K)
        .select("probe_id", "neighbor_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "neighbor_id")
    )
