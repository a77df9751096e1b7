"""IVF recall-vs-nprobe operating curve (SURVEY.md §2B similarity
north star, round 8).

sim_ann_ivf runs the index at ONE operating point (nprobe=8);
sim_ann_quality pins that point's recall floor. This measures the
whole curve — recall@k for nprobe ∈ {1, 2, 4, 8, 16} over a probe
panel — the table that picks the latency/recall trade (the IVF
counterpart of sim_matryoshka_curve's dimension sweep and
dedup_lsh_band_sweep's band sweep; same measured-tuning-curve
discipline).

ONE corpus scan, no per-nprobe searches: because IVF re-ranks its
candidates with EXACT cosine, a member of the exact top-k is
retrieved at probe depth p iff its cluster sits among the probe's p
nearest centroids (nothing outside the exact top-k can outscore it).
So recall@k(p) = fraction of exact-top-k hits whose CLUSTER RANK
< p — computable for every p from one exact top-k pass joined to the
bounded (probe × cluster) rank table. The nprobe = k_clusters row is
an exactness witness: scanning every posting list MUST give recall
1.0, pinned in tests.

Rows-only by design (k-means centers are seeded randomness, not SQL);
monotonicity + the 1.0 endpoint + the operating-point floor are
pinned in tests/test_round8_ops.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.vectors import cosine
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

IVC_PROBES = 8  # probe panel: vec_id < IVC_PROBES
IVC_K = 10
IVC_NPROBES = (1, 2, 4, 8, 16)  # 16 = k_clusters: the exactness row


@register(
    "sim_ivf_recall_curve",
    oracle=None,  # rows-only: centers are seeded k-means randomness
    tags=("similarity", "ann", "ivf", "tuning"),
)
def sim_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{IVC_K} of the persisted IVF index (k=16, seed 42 — the
    SAME cached index sim_ann_ivf serves) at probe depths
    {IVC_NPROBES}, averaged over a {IVC_PROBES}-probe panel. Computed
    from one exact top-{IVC_K} pass: an exact hit is retrieved at
    depth p iff its cluster ranks among the probe's p nearest
    centroids, so every depth reads off the same (hit, cluster-rank)
    join — no per-depth index search. The final row (nprobe = all
    clusters) must be exactly 1.0; the curve is nondecreasing by
    construction.

    Scale shape: the probe panel and the probe×cluster rank table are
    bounded collects ({IVC_PROBES} vectors, {IVC_PROBES}×16 ranks);
    the corpus is scanned ONCE with the broadcast panel (the
    sim_cosine_topk_batch shape); everything after the per-probe
    top-{IVC_K} window operates on {IVC_PROBES}·{IVC_K} rows."""
    import os

    import numpy as np

    from target_iceberg_spark.operators.ivf import (
        build_or_load_ivf,
        index_cache_path,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    source = os.path.join(sf_dir, "embeddings.parquet")
    index = build_or_load_ivf(
        spark,
        emb,
        index_cache_path(source, "embedding", 16, 42),
        k=16,
        seed=42,
        source=source,
    )
    probes = emb.where(F.col("vec_id") < IVC_PROBES).collect()  # bounded
    ranks = []
    for r in probes:
        d = np.linalg.norm(
            index.centroids - np.asarray(r["embedding"]), axis=1
        )
        for crank, c in enumerate(np.argsort(d)):
            ranks.append((int(r["vec_id"]), int(c), crank))
    rank_df = spark.createDataFrame(
        ranks, "probe_id LONG, cluster INT, crank INT"
    )
    panel = spark.createDataFrame(
        [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in probes
        ],
        "probe_id LONG, pvec ARRAY<DOUBLE>",
    )
    scored = (
        index.postings.crossJoin(F.broadcast(panel))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "cluster",
            cosine(F.col("embedding"), F.col("pvec")).alias("cs"),
        )
    )
    topk = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(
                    F.desc("cs"), "vec_id"
                )
            ),
        )
        .where(F.col("rn") <= IVC_K)
        .join(F.broadcast(rank_df), ["probe_id", "cluster"])
    )
    depths = spark.createDataFrame(
        [(p,) for p in IVC_NPROBES], "nprobe INT"
    )
    return (
        topk.crossJoin(F.broadcast(depths))
        .groupBy("nprobe")
        .agg(
            F.lit(IVC_PROBES).cast("bigint").alias("n_probes"),
            F.round(
                F.count(F.when(F.col("crank") < F.col("nprobe"), 1))
                / (IVC_PROBES * float(IVC_K)),
                4,
            ).alias(f"recall_at_{IVC_K}"),
        )
        .orderBy("nprobe")
    )
