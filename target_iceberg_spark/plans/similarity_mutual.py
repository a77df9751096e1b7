"""Mutual (reciprocal) k-NN pairs over the LSH candidate graph
(SURVEY.md §2B similarity tier, round 9).

A pair where EACH vector ranks the other inside its top-k is the
classic high-precision duplicate/near-identity signal: one-directional
top-k is polluted by hubs (a vector near a dense cluster center is in
everyone's top-k without being anyone's duplicate), while reciprocity
filters hubness out (Jegou et al. "Accurate image search using the
contextual dissimilarity measure", PAMI'10; Qin et al. CVPR'11
k-reciprocal re-ranking — public). Production mutual-kNN is always
computed over an ANN candidate graph, never all pairs, so this query
ranks within the deterministic banded sign-LSH candidate set (the
same oracle-checkable blocking sim_ann_rp uses).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.vectors import (
    cosine_sql,
    sign_bucket,
    sign_bucket_sql,
)
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

RKNN_BANDS = 2  # OR-amplified: candidates share ANY band bucket
RKNN_K = 5  # reciprocal rank threshold
RKNN_TOP = 25  # output rows
RKNN_TARGET_BUCKET = 32  # sized-for occupancy per band bucket
RKNN_MIN_BITS = 4  # floor = the oracle's instantiation at test SFs
RKNN_MAX_BITS = 12  # 2 bands x 12 bits <= 24 of d=64 sign dims


def rknn_bits(n_vectors: int) -> int:
    """Corpus-sized bucket width: enough sign bits that a band bucket
    holds ~RKNN_TARGET_BUCKET vectors. Within-bucket pair volume is
    quadratic in occupancy, so FIXED bits turn 10x data into ~100x
    pairs (the round-9 scale audit measured exactly that at 20x);
    sizing bits from N holds occupancy — and therefore per-vector
    candidate degree — constant. Same NDV-derived-sizing discipline
    as the Bloom join's sized_m (plans/joins_bloom.py). The MIN_BITS
    floor keeps the driver-checked sf0.01/0.001 instantiation (500
    vectors -> 4 bits) identical to the static oracle SQL."""
    import math

    raw = math.ceil(math.log2(max(n_vectors, 1) / RKNN_TARGET_BUCKET))
    return max(RKNN_MIN_BITS, min(RKNN_MAX_BITS, raw))


def _rknn_oracle(bits: int = RKNN_MIN_BITS) -> str:
    # the REGISTERED oracle pins the MIN_BITS instantiation — what
    # rknn_bits() yields at every driver-checked SF (500 vectors ->
    # 4 bits); tests/test_round9_ops.py re-derives the oracle at the
    # adaptive width for larger fixtures and runs the same comparison
    keys = "\nUNION ALL ".join(
        f"SELECT vec_id, {t} AS band, "
        f"{sign_bucket_sql('embedding', bits, offset=t * bits)}"
        " AS bucket FROM embeddings"
        for t in range(RKNN_BANDS)
    )
    cos = f"ROUND({cosine_sql('ea.embedding', 'eb.embedding')}, 6)"
    return f"""
WITH keys AS ({keys}),
cand AS (
    SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
    FROM keys a JOIN keys b USING (band, bucket)
    WHERE a.vec_id < b.vec_id
),
scored AS (
    SELECT cand.va, cand.vb, {cos} AS cos_sim
    FROM cand
    JOIN embeddings ea ON ea.vec_id = cand.va
    JOIN embeddings eb ON eb.vec_id = cand.vb
),
sym AS (
    SELECT va AS src, vb AS dst, cos_sim FROM scored
    UNION ALL
    SELECT vb, va, cos_sim FROM scored
),
ranked AS (
    SELECT src, dst, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY cos_sim DESC, dst) AS rn
    FROM sym
)
SELECT f.src AS va, f.dst AS vb, f.cos_sim,
       CAST(f.rn AS BIGINT) AS rank_ab,
       CAST(r.rn AS BIGINT) AS rank_ba
FROM ranked f
JOIN ranked r ON f.src = r.dst AND f.dst = r.src
WHERE f.src < f.dst AND f.rn <= {RKNN_K} AND r.rn <= {RKNN_K}
ORDER BY f.cos_sim DESC, va, vb
LIMIT {RKNN_TOP}
"""


# NOTE: the registered oracle pins the RKNN_MIN_BITS instantiation,
# which matches rknn_bits(N) only while the driver fixture holds
# <= RKNN_TARGET_BUCKET * 2**RKNN_MIN_BITS = 512 vectors (sf0.001 and
# sf0.01 both ship 500). A larger driver fixture would make the plan
# and this static SQL use different LSH blockings — regenerate with
# _rknn_oracle(rknn_bits(N)) in that case (tests/test_round9_ops.py
# already runs the width-parametric comparison at bigger fixtures).
@register(
    "sim_reciprocal_knn",
    oracle=_rknn_oracle(),
    tags=("similarity", "ann", "dedup"),
)
def sim_reciprocal_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{RKNN_TOP} mutual-{RKNN_K}-NN pairs: candidate pairs come
    from the deterministic banded sign-LSH blocking ({RKNN_BANDS}
    bands x rknn_bits(N) sign bits, same planes as sim_ann_rp), each
    vector ranks its candidates by exact cosine, and a pair survives
    only if each side ranks the other within its top-{RKNN_K}.

    Scale shape: candidate generation is an equi-join on (band,
    bucket) — never all pairs; each scored pair is written once and
    symmetrized by a column swap (no second scoring pass); per-vector
    ranking is one partitioned window over candidate degree (bounded
    by bucket occupancy, which banded LSH keeps at ~N/2^bits); the
    reciprocity test is a self-equi-join of the ranked list on the
    reversed pair key. Embeddings join candidates by id, so vectors
    shuffle once per side, not per pair."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bits = rknn_bits(emb.count())  # metadata-cheap; sizes the buckets
    keys = None
    for t in range(RKNN_BANDS):
        k = emb.select(
            "vec_id",
            F.lit(t).alias("band"),
            sign_bucket("embedding", bits, offset=t * bits).alias(
                "bucket"
            ),
        )
        keys = k if keys is None else keys.unionAll(k)
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        .distinct()
    )
    # Per-VECTOR squared norms instead of per-PAIR: cosine() is
    # dot/sqrt(sq_norm*sq_norm), so dividing the pair dot by
    # sqrt(_na * _nb) is the IDENTICAL float expression — bit-exact,
    # with 2 of the 3 array folds moved off the per-candidate stage
    # (the embedding_band_pairs discipline).
    from target_iceberg_spark.functions.vectors import dot, sq_norm

    ea = emb.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("va_vec"),
        sq_norm("embedding").alias("_na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("vb_vec"),
        sq_norm("embedding").alias("_nb"),
    )
    # localCheckpoint: `scored` feeds BOTH symmetrization branches and
    # `ranked` feeds BOTH reciprocity sides — without the two
    # checkpoints the LSH candidate join + scoring executed up to 4x
    # (guide §2.4); both tables are candidate-pair-sized.
    scored = (
        cand.join(ea, "va")
        .join(eb, "vb")
        .select(
            "va",
            "vb",
            F.round(
                dot("va_vec", "vb_vec")
                / F.sqrt(F.col("_na") * F.col("_nb")),
                6,
            ).alias("cos_sim"),
        )
    ).localCheckpoint()
    sym = scored.select(
        F.col("va").alias("src"), F.col("vb").alias("dst"), "cos_sim"
    ).unionAll(
        scored.select(
            F.col("vb").alias("src"), F.col("va").alias("dst"), "cos_sim"
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
    ranked = sym.withColumn("rn", F.row_number().over(w)).localCheckpoint()
    fwd = ranked.select("src", "dst", "cos_sim", F.col("rn").alias("rank_ab"))
    rev = ranked.select(
        F.col("src").alias("dst"),
        F.col("dst").alias("src"),
        F.col("rn").alias("rank_ba"),
    )
    return (
        fwd.join(rev, ["src", "dst"])
        .where(
            (F.col("src") < F.col("dst"))
            & (F.col("rank_ab") <= RKNN_K)
            & (F.col("rank_ba") <= RKNN_K)
        )
        .select(
            F.col("src").alias("va"),
            F.col("dst").alias("vb"),
            "cos_sim",
            F.col("rank_ab").cast("bigint").alias("rank_ab"),
            F.col("rank_ba").cast("bigint").alias("rank_ba"),
        )
        .orderBy(F.desc("cos_sim"), "va", "vb")
        .limit(RKNN_TOP)
    )
