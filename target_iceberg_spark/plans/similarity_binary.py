"""Binary (sign-bit) embedding compression + Hamming retrieval
(SURVEY.md §2B similarity north star, round-5 post-window).

The published memory-side extreme of embedding compression (binary
passage retrieval / "binary embeddings": 1 bit per dimension, 32x
smaller than float32, distance = XOR + popcount): emb_quantize_int8
keeps 8 bits/dim, operators/pq.py keeps ~log2(K) bits/subspace, and
this keeps exactly ONE — the variant cheap enough to hold a trillion
vectors in RAM and scan them with two machine instructions per pair.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PROBE_VEC_ID = 0
TOP_K = 10
WORD_BITS = 32  # dims per packed word: 64-dim vectors -> 2 words


def _pack_word_sql(off: int) -> str:
    """DuckDB: positional sign-bit sum == the Spark Horner fold below
    (integer arithmetic — exact in both engines, no fp in sight)."""
    return (
        f"list_sum(list_transform(range(0, {WORD_BITS}), i -> "
        f"(CASE WHEN embedding[i + {off + 1}] >= 0 THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END << ({WORD_BITS - 1} - i))))"
    )


def _pack_word(off: int):
    return F.aggregate(
        F.slice("embedding", off + 1, WORD_BITS),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc * 2 + F.when(x >= 0, 1).otherwise(0),
    )


@register(
    "sim_binary_hamming",
    oracle=f"""
WITH packed AS (
    SELECT vec_id,
           {_pack_word_sql(0)} AS w0,
           {_pack_word_sql(WORD_BITS)} AS w1
    FROM embeddings
),
probe AS (SELECT w0 AS p0, w1 AS p1 FROM packed WHERE vec_id = {PROBE_VEC_ID})
SELECT vec_id,
       CAST(bit_count(xor(w0, p0)) + bit_count(xor(w1, p1)) AS INT)
           AS hamming
FROM packed, probe
WHERE vec_id <> {PROBE_VEC_ID}
ORDER BY hamming, vec_id
LIMIT {TOP_K}
""",
    tags=("similarity", "binary", "hamming"),
)
def sim_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} nearest neighbors of one probe under SIGN-BINARIZED
    embeddings: each 64-dim float vector packs into two {WORD_BITS}-bit
    words (a row-local integer Horner fold over the sign bits — exact,
    engine-portable, no floats), and distance is XOR + popcount per
    word pair.

    Scale shape: the packed index is 16 bytes/vector — at 100 TB of
    raw embeddings the binary index fits where floats cannot, and the
    scan is two xor/popcount ALU ops per candidate inside whole-stage
    codegen with a one-row broadcast probe and TakeOrderedAndProject.
    The packing itself is the one-off map stage you persist. For sign-
    random vectors Hamming rank correlates with angular rank (it IS
    1-bit sign-LSH with the identity rotation); recall vs the exact
    cosine arm is pinned in tests/test_session4_ops.py, the same
    evidence pattern as sim_ann_rp."""
    emb = load_table(spark, sf_dir, "embeddings")
    packed = emb.select(
        "vec_id",
        _pack_word(0).alias("w0"),
        _pack_word(WORD_BITS).alias("w1"),
    )
    probe = packed.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("w0").alias("p0"), F.col("w1").alias("p1")
    )
    ham = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("p0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("p1")))
    ).cast("int")
    return (
        packed.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", ham.alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(TOP_K)
    )


FID_CAND = 30  # hamming shortlist width audited against exact top-k

_COS_RANKED_SQL = f"""
probe_f AS (
    SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
exact_k AS (
    SELECT vec_id
    FROM (
        SELECT e.vec_id,
               ROUND((list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p[i] AS DOUBLE)))
                 / sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                      * list_sum(list_transform(range(1, len(p) + 1),
                        i -> CAST(p[i] AS DOUBLE) * CAST(p[i] AS DOUBLE))))), 6)
                   AS cos_sim
        FROM embeddings e, probe_f
        WHERE e.vec_id <> {PROBE_VEC_ID}
    )
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
)"""


@register(
    "sim_hamming_fidelity",
    oracle=f"""
WITH packed AS (
    SELECT vec_id,
           {_pack_word_sql(0)} AS w0,
           {_pack_word_sql(WORD_BITS)} AS w1
    FROM embeddings
),
probe AS (SELECT w0 AS p0, w1 AS p1 FROM packed WHERE vec_id = {PROBE_VEC_ID}),
ham_c AS (
    SELECT vec_id
    FROM (
        SELECT vec_id,
               bit_count(xor(w0, p0)) + bit_count(xor(w1, p1)) AS hamming
        FROM packed, probe
        WHERE vec_id <> {PROBE_VEC_ID}
    )
    ORDER BY hamming, vec_id
    LIMIT {FID_CAND}
),
{_COS_RANKED_SQL}
SELECT CAST({TOP_K} AS INT) AS k, CAST({FID_CAND} AS INT) AS shortlist,
       CAST(COUNT(*) AS BIGINT) AS n_overlap,
       ROUND(COUNT(*) * 1.0 / {TOP_K}, 4) AS recall_at_k
FROM exact_k JOIN ham_c USING (vec_id)
""",
    tags=("similarity", "binary", "audit"),
)
def sim_hamming_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The binary arm's quality gate AS a query (the sim_recall_audit
    pattern applied to sign-bit Hamming): how many of the exact cosine
    top-{TOP_K} survive in the {FID_CAND}-wide Hamming shortlist — the
    number that decides whether the 32x-smaller binary index can serve
    as the first-stage filter with exact re-ranking on the shortlist.
    Promotes the recall evidence previously pinned only in unit tests
    to a driver-hashed row that flips if the packing or ranking
    silently degrades.

    Scale shape: both arms are the already-scale-argued plans (two-
    instruction XOR+popcount scan; broadcast-probe codegen fold), each
    reduced to a tiny id list by TakeOrderedAndProject; the audit adds
    one {TOP_K}-row equi-join. Hamming ties break on vec_id and the
    cosine is rounded to 6 in both engines, so the shortlist frontier
    is deterministic — the audit value is hash-exact, not a bound."""
    from target_iceberg_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    packed = emb.select(
        "vec_id",
        _pack_word(0).alias("w0"),
        _pack_word(WORD_BITS).alias("w1"),
    )
    probe = packed.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("w0").alias("p0"), F.col("w1").alias("p1")
    )
    ham = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("p0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("p1")))
    ).cast("int")
    ham_c = (
        packed.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", ham.alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(FID_CAND)
        .select("vec_id")
    )
    probe_f = emb.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_vec")
    )
    exact_k = (
        emb.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe_f))
        .select(
            "vec_id",
            F.round(cosine("embedding", "probe_vec"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(TOP_K)
        .select("vec_id")
    )
    return exact_k.join(ham_c, "vec_id").agg(
        F.lit(TOP_K).cast("int").alias("k"),
        F.lit(FID_CAND).cast("int").alias("shortlist"),
        F.count(F.lit(1)).cast("bigint").alias("n_overlap"),
        F.round(F.count(F.lit(1)) * 1.0 / TOP_K, 4).alias("recall_at_k"),
    )
