"""Perceptual-hash near-duplicate detection over binary payloads
(SURVEY.md §2B multimodal tier, round-6 post-window).

multimodal_dedup catches bit-identical payloads; re-encoded or
slightly-edited media needs a PERCEPTUAL signature. This is the
classic average-hash (aHash, public): block the decoded signal,
threshold each block against the global mean, pack the bits, and
match within a Hamming radius via pigeonhole band blocking — the
image-near-dup recipe every large-scale media pipeline runs. The
codec is the tier's honest deterministic fake (payload bytes AS the
signal, operators/multimodal.py), so the Python mapInPandas feature
stage is SQL-mirrored and the whole chain is hash-checkable; with a
real decoder only the block-sum source changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.multimodal import attach_payload
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PH_BLOCKS = 16  # signature bits
PH_BLOCK_BYTES = 16  # bytes averaged per block
PH_MIN_BYTES = PH_BLOCKS * PH_BLOCK_BYTES  # 256: docs shorter are skipped
PH_BANDS = 4  # 4 bands x 4 bits
PH_HAM_MAX = 3  # pigeonhole: ham <= 3 => >= 1 of 4 bands intact


def _block_sum_sql(j: int) -> str:
    terms = " + ".join(
        f"ord(substr(text, {j * PH_BLOCK_BYTES + i + 1}, 1))"
        for i in range(PH_BLOCK_BYTES)
    )
    return f"({terms})"


def _ahash_sql() -> str:
    blocks = ", ".join(_block_sum_sql(j) for j in range(PH_BLOCKS))
    bits = " + ".join(
        f"(CASE WHEN {PH_BLOCKS} * b[{j + 1}] > tot THEN {1 << j}"
        f" ELSE 0 END)"
        for j in range(PH_BLOCKS)
    )
    return f"""
sig AS (
    SELECT doc_id, b, list_sum(b) AS tot
    FROM (SELECT doc_id, [{blocks}] AS b
          FROM documents WHERE n_chars >= {PH_MIN_BYTES})
),
hashes AS (SELECT doc_id, CAST({bits} AS BIGINT) AS ahash FROM sig)"""


@register(
    "multimodal_phash_neardup",
    oracle=f"""
WITH {_ahash_sql()},
bands AS (
    SELECT doc_id, ahash, band,
           (ahash >> (4 * band)) & 15 AS key
    FROM hashes CROSS JOIN (SELECT unnest(range(0, {PH_BANDS})) AS band)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.ahash AS ha, b.ahash AS hb
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(CAST(xor(ha, hb) AS BIGINT)) AS INT) AS hamming
FROM cand
WHERE bit_count(CAST(xor(ha, hb) AS BIGINT)) <= {PH_HAM_MAX}
ORDER BY doc_a, doc_b
""",
    tags=("multimodal", "dedup", "perceptual"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over the multimodal payload column:
    the fake-decoded signal ({PH_MIN_BYTES}-byte prefix) is blocked
    into {PH_BLOCKS} block sums inside the Arrow mapInPandas stage
    (the REAL multimodal plumbing — payload bytes never leave the
    executors, only the {PH_BLOCKS}-bit signature does), each block
    thresholds against the global mean by the integer-exact cross
    comparison {PH_BLOCKS}*block > total (no division), and pairs
    within Hamming {PH_HAM_MAX} surface via {PH_BANDS}x4-bit
    pigeonhole band blocking — ham <= {PH_HAM_MAX} guarantees a
    shared band, so candidates come from an EQUI-join on (band, key),
    never an all-pairs XOR.

    Scale shape: the signature stage is one Arrow-batched pass
    (with a real decoder only the block-sum source changes); bands
    shuffle as (band, 4-bit key) ints; the pair set is bucket-bounded
    exactly like dedup_simhash, DISTINCT'ed before the popcount
    verify; short payloads (< {PH_MIN_BYTES} bytes) are excluded in
    both engines — also dodging the Spark ascii('')=0 vs DuckDB
    ord('')=-1 seam on out-of-range reads."""
    docs = attach_payload(
        load_table(spark, sf_dir, "documents").where(
            F.col("n_chars") >= PH_MIN_BYTES
        )
    )

    def ahash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                blocks = [
                    sum(
                        raw[
                            j * PH_BLOCK_BYTES : (j + 1) * PH_BLOCK_BYTES
                        ]
                    )
                    for j in range(PH_BLOCKS)
                ]
                tot = sum(blocks)
                ahash = 0
                for j, b in enumerate(blocks):
                    if PH_BLOCKS * b > tot:
                        ahash |= 1 << j
                out.append((doc_id, ahash))
            yield pd.DataFrame(out, columns=["doc_id", "ahash"])

    hashes = docs.select("doc_id", "payload").mapInPandas(
        ahash_batches, "doc_id long, ahash long"
    )
    bands = hashes.select(
        "doc_id",
        "ahash",
        F.explode(F.array(*[F.lit(b) for b in range(PH_BANDS)])).alias(
            "band"
        ),
    ).withColumn("key", F.expr("shiftright(ahash, 4 * band) % 16"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        cand.where(ham <= PH_HAM_MAX)
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )
