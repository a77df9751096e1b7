"""IVF+PQ composed ANN — the FAISS "IVFADC" production index layout
(SURVEY.md §2B similarity north star, round 10; VERDICT r9 task 2).

At 100 TB neither parent arm is the deployed shape on its own:
sim_ann_ivf routes probes to nprobe posting lists but stores FLOAT
vectors in them (the index is as big as the corpus), while sim_ann_pq
compresses vectors 32x but ADC-scans the WHOLE corpus per probe.
The production layout (Jégou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011, §IV "IVFADC"; the FAISS
IndexIVFPQ) composes them:

  1. ROUTE  — the coarse k-means quantizer picks the probe's nprobe
     nearest clusters (operators/ivf.py; centroid table is tiny and
     driver-resident).
  2. SCAN   — ONLY the probed posting lists are read (partition
     pruning on the cluster-partitioned postings), and each candidate
     is scored by PQ asymmetric distance: M element_at lookups into
     the probe's literal M x K table over the candidate's codes —
     whole-stage codegen, no float vector touched (operators/pq.py).
  3. RERANK — the ADC top-C shortlist joins back to the float vectors
     for an exact L2 re-rank of C rows, washing out quantization
     error in the final top-k.

Work per probe: O(k·d) routing + O(nprobe·N/k·M) code lookups +
O(C·d) re-rank — vs O(N·d) brute force; the scan's working set is
M bytes/vector, which is what lets the hot index of a 100 TB corpus
live in memory.

The registered query encodes the probed lists' vectors on the fly
(one vectorized Arrow pass over ONLY the pruned partitions — same
rows the scan reads anyway at test SF); at scale the codes are
written once beside the postings and step 2 never reads a float.
Seeded k-means centers (coarse + sub-codebooks) make the result
rows-only by design, like the three parent arms; its recall floor is
folded into sim_ann_quality's hash-checked row as the fourth arm and
pinned in tests/test_round10_ops.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.functions.vectors import l2_dist
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.similarity import PROBE_VEC_ID, TOP_K
from target_iceberg_spark.sources.tables import load_table

IVFPQ_NPROBE = 8  # of k=16 coarse clusters (uniform synthetic corpus
# needs an aggressive probe fraction for honest recall — same argument
# as sim_ann_ivf's nprobe=8; clustered production data sits at 1/16+)
IVFPQ_SHORTLIST = 100  # shortlist FLOOR — corpus-sized above it
IVFPQ_M = 8  # PQ subspaces -> 8 one-byte codes per vector
IVFPQ_K = 16  # sub-centroid FLOOR — corpus-sized above it (round 12:
# fixed K/C held the recall floor only on the tiny fixtures; the sf1
# audit run caught ivfpq under 0.8 at 20k vectors. Both knobs now
# follow operators/pq.py::pq_codebook_k / pq_shortlist, identical
# small-SF instantiation)


def ivfpq_search(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = PROBE_VEC_ID,
    nprobe: int = IVFPQ_NPROBE,
    shortlist: int | None = None,
    top_k: int = TOP_K,
    probe_vec: list[float] | None = None,
) -> DataFrame:
    """One IVFADC search against the cached coarse index + seeded PQ
    codebooks; returns the exact-L2 re-ranked top-k (vec_id, dist)."""
    from target_iceberg_spark.operators.ivf import (
        build_or_load_ivf,
        index_cache_path,
    )
    from target_iceberg_spark.operators.pq import (
        adc_distance_expr,
        corpus_count,
        encode_pq,
        fit_pq_codebooks,
        pq_codebook_k,
        pq_shortlist,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    source = os.path.join(sf_dir, "embeddings.parquet")
    n_vectors = corpus_count(emb, cache_key=source)  # sizes the PQ knobs
    if shortlist is None:
        shortlist = pq_shortlist(n_vectors, floor=IVFPQ_SHORTLIST)
    index = build_or_load_ivf(
        spark,
        emb,
        index_cache_path(source, "embedding", 16, 42),
        k=16,
        seed=42,
        source=source,
    )
    books = fit_pq_codebooks(
        emb,
        m=IVFPQ_M,
        k=max(IVFPQ_K, pq_codebook_k(n_vectors)),
        seed=42,
        cache_key=source,
    )
    # probe_vec: composed callers collect the probe once and pass it
    # in (round 13, guide §5.1); standalone path unchanged
    if probe_vec is None:
        probe_vec = bounded_collect(
            emb.where(F.col("vec_id") == probe_vec_id),
            cap=1,
            why="unique vec_id == probe literal",
            structural=False,
        )[0]["embedding"]
    probe = np.asarray(probe_vec, dtype=np.float64)
    # step 1 — ROUTE: nprobe nearest coarse centroids (driver-side,
    # k=16 rows; identical to ivf_search's routing)
    dists = np.linalg.norm(index.centroids - probe, axis=1)
    clusters = [int(c) for c in np.argsort(dists)[:nprobe]]
    # step 2 — SCAN: partition-prune postings to the probed lists,
    # encode that pruned slice once (Arrow pass), ADC-score in codegen
    pruned = index.postings.where(
        F.col("cluster").isin(clusters) & (F.col("vec_id") != probe_vec_id)
    )
    coded = encode_pq(
        pruned.select("vec_id", "embedding"), books
    ).select("vec_id", "pq_codes")
    adc_topc = (
        coded.select(
            "vec_id", adc_distance_expr(probe, books).alias("adc")
        )
        .orderBy("adc", "vec_id")
        .limit(shortlist)
    )
    # step 3 — RERANK: exact L2 over the C-row shortlist only
    p = F.lit(np.ascontiguousarray(probe))
    return (
        emb.join(F.broadcast(adc_topc.select("vec_id")), "vec_id")
        .select(
            "vec_id", F.round(l2_dist("embedding", p), 6).alias("dist")
        )
        .orderBy("dist", "vec_id")
        .limit(top_k)
    )


@register("sim_ann_ivfpq", oracle=None, tags=("similarity", "ann", "ivf", "pq"))
def sim_ann_ivfpq(
    spark: SparkSession, sf_dir: str, probe_vec: list[float] | None = None
) -> DataFrame:
    """IVFADC (IVF routing + PQ ADC scan + exact re-rank) — see module
    docstring. Rows-only by design (seeded coarse + sub-codebook
    k-means); recall@{TOP_K} >= the sim_ann_quality floor is the
    hash-checked contract (fourth arm), and the pinned unit test
    additionally asserts the shortlist's containment behavior."""
    return ivfpq_search(spark, sf_dir, probe_vec=probe_vec)
