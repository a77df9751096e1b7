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

from target_iceberg_spark.bounded import bounded_collect
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


def _mmr_oracle() -> str:
    from target_iceberg_spark.functions.vectors import cosine_sql

    return f"""
WITH probe AS (
    SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
fp AS (
    SELECT vec_id FROM embeddings, probe
    WHERE vec_id <> {PROBE_VEC_ID}
    ORDER BY {cosine_sql('embedding', 'p')} DESC, vec_id
    LIMIT 1
)
SELECT CAST({TOP_K} AS BIGINT) AS n_selected,
       CAST(fp.vec_id AS BIGINT) AS first_pick_vec_id,
       TRUE AS picks_unique,
       TRUE AS picks_within_candidates,
       TRUE AS diversity_no_worse
FROM fp
"""


@register("emb_mmr", oracle=_mmr_oracle(), tags=("similarity", "mmr", "rerank", "audit"))
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
    distributed part is the part that scales.

    Hash-checkable audit row (round 9; previously rows-only): the
    greedy SEQUENCE has no SQL twin, but its endpoints do — the first
    pick IS the exact relevance argmax (SQL-computable, value-checked
    by the oracle, exercising the candidate-generation fold
    bit-for-bit), and the selection invariants (k picks, all unique,
    all from the top-C pool, MMR's worst pairwise overlap no worse
    than pure relevance's) fold to oracle-asserted booleans. Exact
    numpy equivalence of the full sequence and the STRICT diversity
    win stay pinned in tests/test_round5_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = [
        float(x)
        for x in bounded_collect(
            emb.where(F.col("vec_id") == PROBE_VEC_ID),
            cap=1,
            why="unique vec_id == PROBE_VEC_ID literal",
            structural=False,
        )[0]["embedding"]
    ]
    p_lit = F.array(*[F.lit(v) for v in probe])
    cands = bounded_collect(
        emb.where(F.col("vec_id") != PROBE_VEC_ID)
        .select("vec_id", "embedding", cosine("embedding", p_lit).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_CANDIDATES),
        cap=MMR_CANDIDATES,
        why="explicit limit(MMR_CANDIDATES): C x d, corpus-size independent",
    )
    cvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in cands
    }
    picked = mmr_select(
        [(r["vec_id"], cvecs[r["vec_id"]], r["rel"]) for r in cands],
        TOP_K,
        MMR_LAMBDA,
    )
    import math

    def _cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        n = math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))
        return d / n if n > 0 else 0.0

    def _worst_overlap(ids: list[int]) -> float:
        return max(
            (
                _cos(cvecs[a], cvecs[b])
                for i, a in enumerate(ids)
                for b in ids[i + 1 :]
            ),
            default=0.0,
        )

    mmr_ids = [vid for vid, _, _ in picked]
    rel_ids = [r["vec_id"] for r in cands[:TOP_K]]
    row = (
        len(picked),
        int(mmr_ids[0]),
        len(set(mmr_ids)) == len(mmr_ids),
        all(v in cvecs for v in mmr_ids),
        _worst_overlap(mmr_ids) <= _worst_overlap(rel_ids),
    )
    return spark.createDataFrame(
        [row],
        "n_selected BIGINT, first_pick_vec_id BIGINT,"
        " picks_unique BOOLEAN, picks_within_candidates BOOLEAN,"
        " diversity_no_worse BOOLEAN",
    )
