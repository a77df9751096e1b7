"""Document chunking for RAG / context-window packing (SURVEY.md §2B
text tier; the reference — SidetrekAI/target-iceberg, write-only —
has no query surface).

The chunker every retrieval or training pipeline runs between raw
documents and the embedding/packing stage: fixed-size token windows
with overlap, so no sentence is lost at a boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "text_chunk_overlap",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents
),
s AS (
    SELECT doc_id, toks,
           CASE WHEN len(toks) <= {CHUNK_TOKENS} THEN 1
                ELSE CAST(CEIL((len(toks) - {CHUNK_TOKENS})
                               / {CHUNK_STRIDE}.0) AS INT) + 1
           END AS n_chunks
    FROM t
),
x AS (
    SELECT doc_id, toks,
           UNNEST(range(0, n_chunks)) AS ci
    FROM s
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       CAST(len(toks[ci * {CHUNK_STRIDE} + 1 :
                     ci * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS INT)
           AS n_tokens,
       md5(array_to_string(toks[ci * {CHUNK_STRIDE} + 1 :
                                ci * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '))
           AS chunk_md5
FROM x
""",
    tags=("text", "chunking", "rag"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: every document becomes
    ceil-strided windows of 64 tokens advancing by 48 (16-token
    overlap), the slice feeding an embedding model or a packed
    training shard. Emits (doc_id, chunk_idx, n_tokens, chunk_md5) —
    the md5 digest stands in for the chunk text so the whole Python-
    free pipeline is hash-checkable without shipping megabytes
    through the comparator.

    Scale shape: a PURE MAP — split, a per-doc bounded
    explode(sequence) fan-out of ~n_tokens/stride rows, slice,
    concat, md5, all codegen expressions; zero shuffles, zero joins,
    no ordering (the comparator is order-insensitive and nothing
    downstream needs a global sort). This is the embarrassingly
    parallel shape chunking must keep at 100 TB: each task chunks its
    own documents and the stage never exchanges a byte."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    sized = toks.select(
        "doc_id",
        "toks",
        F.when(F.size("toks") <= CHUNK_TOKENS, F.lit(1))
        .otherwise(
            F.ceil(
                (F.size("toks") - CHUNK_TOKENS) / F.lit(float(CHUNK_STRIDE))
            ).cast("int")
            + 1
        )
        .alias("n_chunks"),
    )
    exploded = sized.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("ci"),
    )
    chunk = F.slice(
        "toks", F.col("ci") * CHUNK_STRIDE + 1, F.lit(CHUNK_TOKENS)
    )
    return exploded.select(
        "doc_id",
        F.col("ci").cast("long").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )
