"""Maximal Marginal Relevance diversified retrieval (SURVEY.md §2B
similarity north star, round-5 post-window tier).

MMR (Carbonell & Goldstein, SIGIR 1998) is the standard rerank between
a similarity index and a consumer that needs VARIED results (RAG
context assembly, dedup-aware retrieval): relevance alone returns k
near-copies of the best hit; MMR greedily trades relevance against
similarity to what is already selected.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.vectors import cosine
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.similarity import PROBE_VEC_ID, TOP_K
from target_iceberg_spark.sources.tables import load_table

MMR_LAMBDA = 0.5
MMR_CANDIDATES = 50  # C: driver-side rerank is bounded by C x d


def mmr_select(cands: list[tuple[int, list[float], float]], k: int, lam: float):
    """Greedy MMR over a BOUNDED candidate list: at each step pick
    argmax lam*rel(d) - (1-lam)*max_{s in S} cos(d, s), ties broken by
    vec_id. Pure-Python float64 arithmetic, deterministic; O(k*C)
    cosine evaluations over C<=MMR_CANDIDATES vectors."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a)
        nb = sum(x * x for x in b)
        denom = math.sqrt(na * nb)
        # zero-norm vector: no direction, contributes no diversity
        # penalty instead of a ZeroDivisionError mid-selection
        return dot / denom if denom > 0.0 else 0.0

    remaining = {vid: (vec, rel) for vid, vec, rel in cands}
    # max cosine to the selected set; -inf until first updated (every
    # remaining candidate is updated after each pick, so it is only
    # -inf while nothing is selected — masked by the `div` guard below)
    max_sim: dict[int, float] = {vid: float("-inf") for vid in remaining}
    selected: list[tuple[int, float, float]] = []  # (vec_id, rel, mmr_score)
    while remaining and len(selected) < k:
        best = None
        for vid, (vec, rel) in remaining.items():
            div = max_sim[vid] if selected else 0.0
            score = lam * rel - (1.0 - lam) * div
            # While nothing is selected the diversity term is zero, so
            # for lam>0 the argmax of lam*rel IS the argmax of rel —
            # but only mathematically: lam*rel can UNDERFLOW to 0.0 for
            # subnormal rel (hypothesis found rel=5e-324, lam=0.5),
            # collapsing a strict ordering into a vec_id tie-break.
            # Rank the first pick on raw relevance to keep the
            # documented "pure-relevance argmax" invariant exact.
            rank_score = rel if not selected and lam > 0.0 else score
            key = (-rank_score, vid)
            if best is None or key < best[0]:
                best = (key, vid, rel, score)
        _, vid, rel, score = best
        sel_vec = remaining.pop(vid)[0]
        selected.append((vid, rel, score))
        for ovid, (ovec, _) in remaining.items():
            s = cos(ovec, sel_vec)
            if s > max_sim[ovid]:
                max_sim[ovid] = s
    return selected


@register("emb_mmr", oracle=None, tags=("similarity", "mmr", "rerank"))
def emb_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k: exact relevance top-C candidate generation
    (the proven broadcast-probe codegen fold + TakeOrderedAndProject —
    the corpus-scale stage), then greedy MMR rerank of the C survivors
    driver-side.

    The collect is BOUNDED at C x d = 50 x dims doubles — corpus-size
    independent, the same documented bound class as the IVF centroid
    pull (operators/ivf.py) and the PCA Gram matrix
    (operators/pca.py:83). Greedy MMR is inherently sequential in k
    (each pick changes every remaining candidate's diversity penalty),
    so the sequential part is run where it is O(k*C) trivial and the
    distributed part is the part that scales. Rows-only driver check
    (greedy selection is not SQL-expressible); exact equivalence vs an
    independent numpy implementation and the diversity property —
    MMR's worst pairwise-overlap strictly below pure relevance's —
    are pinned in tests/test_round5_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = [
        float(x)
        for x in emb.where(F.col("vec_id") == PROBE_VEC_ID).collect()[0]["embedding"]
    ]
    p_lit = F.array(*[F.lit(v) for v in probe])
    cands = (
        emb.where(F.col("vec_id") != PROBE_VEC_ID)
        .select("vec_id", "embedding", cosine("embedding", p_lit).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_CANDIDATES)
        .collect()
    )  # bounded: C x d, corpus-size independent
    picked = mmr_select(
        [(r["vec_id"], [float(x) for x in r["embedding"]], r["rel"]) for r in cands],
        TOP_K,
        MMR_LAMBDA,
    )
    rows = [
        (i + 1, vid, round(rel, 6), round(score, 6))
        for i, (vid, rel, score) in enumerate(picked)
    ]
    return spark.createDataFrame(
        rows, "rnk INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE"
    )
