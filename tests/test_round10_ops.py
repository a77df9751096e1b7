"""Round-10 operator pins: IVFADC (sim_ann_ivfpq) recall + structure,
DSIR planted-target recovery."""

from __future__ import annotations

import pyspark.sql.functions as F

from target_iceberg_spark.functions.vectors import l2_dist
from target_iceberg_spark.plans.similarity import PROBE_VEC_ID, TOP_K
from target_iceberg_spark.plans.similarity_ivfpq import (
    IVFPQ_SHORTLIST,
    ivfpq_search,
)
from target_iceberg_spark.sources.tables import load_table


def _exact_l2_topk(spark, sf_dir, k=TOP_K):
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p")
    )
    return (
        emb.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", l2_dist("embedding", "p").alias("d"))
        .orderBy("d", "vec_id")
        .limit(k)
    )


def test_ivfpq_recall_floor(spark, sf_oracle):
    """The composed IVF+PQ arm meets the same 0.8 recall@10 floor the
    three parent arms pin (sim_ann_quality's hashed contract)."""
    got = {r["vec_id"] for r in ivfpq_search(spark, sf_oracle).collect()}
    exact = {r["vec_id"] for r in _exact_l2_topk(spark, sf_oracle).collect()}
    assert len(got) == TOP_K
    recall = len(got & exact) / TOP_K
    assert recall >= 0.8, f"IVFADC recall@{TOP_K} = {recall}"


def test_ivfpq_more_probes_not_worse(spark, sf_oracle):
    """Probing every coarse cluster turns routing exhaustive: recall
    can only be limited by the PQ shortlist, so the all-clusters run
    must recall at least as much as the serving nprobe=8 run."""
    exact = {r["vec_id"] for r in _exact_l2_topk(spark, sf_oracle).collect()}
    r8 = {
        r["vec_id"]
        for r in ivfpq_search(spark, sf_oracle, nprobe=8).collect()
    }
    r16 = {
        r["vec_id"]
        for r in ivfpq_search(spark, sf_oracle, nprobe=16).collect()
    }
    assert len(r16 & exact) >= len(r8 & exact)


def test_ivfpq_result_within_probed_clusters(spark, sf_oracle):
    """Structure pin: every returned id must come from a probed
    posting list (routing prunes, never rescues), and the result is
    exactly the exact-L2 top-k of the ADC shortlist."""
    import os

    import numpy as np

    from target_iceberg_spark.operators.ivf import (
        build_or_load_ivf,
        index_cache_path,
    )
    from target_iceberg_spark.plans.similarity_ivfpq import IVFPQ_NPROBE

    emb = load_table(spark, sf_oracle, "embeddings")
    source = os.path.join(sf_oracle, "embeddings.parquet")
    index = build_or_load_ivf(
        spark,
        emb,
        index_cache_path(source, "embedding", 16, 42),
        k=16,
        seed=42,
        source=source,
    )
    probe = np.asarray(
        emb.where(F.col("vec_id") == PROBE_VEC_ID).collect()[0]["embedding"]
    )
    dists = np.linalg.norm(index.centroids - probe, axis=1)
    probed = {int(c) for c in np.argsort(dists)[:IVFPQ_NPROBE]}
    member = {
        r["vec_id"]: r["cluster"]
        for r in index.postings.select("vec_id", "cluster").collect()
    }
    got = [r["vec_id"] for r in ivfpq_search(spark, sf_oracle).collect()]
    assert got, "empty IVFADC result"
    for vid in got:
        assert member[vid] in probed, (
            f"vec {vid} from unprobed cluster {member[vid]}"
        )
    assert IVFPQ_SHORTLIST >= len(got)


def test_dsir_recovers_planted_target(spark):
    """DSIR must recover a planted target distribution: raw docs
    written in the target's vocabulary outscore (and are selected
    over) raw docs from a disjoint vocabulary."""
    import pyspark.sql.functions as F

    from target_iceberg_spark.plans.curation_dsir import dsir_select

    vocab_a = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_b = ["zeta", "eta", "theta", "iota", "kappa"]

    def doc(words, i, n=30):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    rows = []
    for i in range(5):  # target: vocab A
        rows.append((i, "target", doc(vocab_a, i)))
    for i in range(10):  # raw pool, target-like
        rows.append((100 + i, "poolA", doc(vocab_a, i + 1)))
    for i in range(40):  # raw pool, off-target
        rows.append((200 + i, "poolB", doc(vocab_b, i)))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = dsir_select(
        docs, F.col("source") == "target", k=10
    ).collect()
    assert len(got) == 10
    from_a = [r for r in got if r["source"] == "poolA"]
    assert len(from_a) >= 8, (
        f"planted target not recovered: {[r['source'] for r in got]}"
    )
    # every target-vocab doc outweighs every off-target doc
    wa = min(r["logw"] for r in got if r["source"] == "poolA")
    wb = [r["logw"] for r in got if r["source"] == "poolB"]
    assert all(wa > w for w in wb) or not wb
