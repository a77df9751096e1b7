"""Multimodal-column plans (SURVEY.md §2B north star).

multimodal_meta is oracle-checked (binary length/hash are engine-
portable); multimodal_decode exercises the mapInPandas decode plumbing
(operators/multimodal.py) and gets the rows-only check — its fake
decoder is Python-side by design, standing in for a codec library.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.multimodal import attach_payload, decode_pipeline
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "multimodal_meta",
    oracle="""
SELECT doc_id, lang,
       CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
       md5(text) AS payload_md5
FROM documents
""",
    tags=("multimodal",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata: byte size and content
    hash of the opaque payload (text bytes stand in for media bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_payload(docs)
    return with_payload.select(
        "doc_id",
        "lang",
        F.col("media_meta.n_bytes").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "multimodal_decode",
    # the fake codec is pure integer arithmetic over the payload's first
    # 64 bytes (ASCII text in the testdata), so even the Python
    # mapInPandas stage is value-hash-checkable by mirroring it in SQL
    oracle="""
WITH cs AS (
    SELECT doc_id, text,
           CAST(list_sum(list_transform(
               range(1, LEAST(length(text), 64) + 1),
               i -> ascii(substr(text, i, 1)))) AS BIGINT) AS checksum
    FROM documents
)
SELECT doc_id,
       CAST(length(text) AS INT) AS n_bytes,
       'image/fake' AS kind,
       CAST(64 + checksum % 512 AS INT) AS width,
       CAST(64 + (checksum // 7) % 512 AS INT) AS height,
       checksum
FROM cs
""",
    tags=("multimodal",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage over binary payloads via Arrow-
    batched mapInPandas (deterministic fake decoder; real codec path is
    stubbed — see operators/multimodal.py). The fake decode derives
    (width, height, checksum) from the payload bytes with integer
    arithmetic, so the whole Python stage is oracle-checked value-exact
    — the plumbing can't silently drop or reorder batch columns."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_pipeline(attach_payload(docs))


@register(
    "multimodal_dedup",
    oracle="""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text
    FROM documents WHERE doc_id % 50 = 0
),
d AS (
    SELECT md5(text) AS payload_md5,
           octet_length(encode(text)) AS n_bytes,
           doc_id
    FROM corpus
)
SELECT payload_md5,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc,
       CAST(MIN(n_bytes) AS INT) AS n_bytes
FROM d
GROUP BY payload_md5
HAVING COUNT(*) > 1
ORDER BY payload_md5
""",
    tags=("multimodal", "dedup"),
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by payload digest — the first (and cheapest)
    dedup stage of any multimodal pipeline: byte-identical payloads
    (re-crawled images, mirrored files) collapse on their content
    hash; only the digest ever shuffles, never the bytes. Emits the
    duplicate groups with the kept (min-id) copy. The synthetic corpus
    has no byte-identical documents, so a deterministic re-crawl
    overlap (every 50th payload re-ingested under a shifted id,
    mirrored in the oracle) makes the duplicate path real instead of
    a vacuous 0-row check.

    Scale shape: md5 computed in the scan stage, ONE combinable
    groupBy on the 16-byte digest, HAVING filter on the count —
    identical cost profile to dedup_exact but keyed on binary content;
    near-dup (perceptual) variants then run only on the survivors."""
    docs = load_table(spark, sf_dir, "documents")
    recrawl = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    corpus = docs.unionByName(recrawl)
    with_payload = attach_payload(corpus)
    d = with_payload.select(
        F.md5("payload").alias("payload_md5"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        "doc_id",
    )
    return (
        d.groupBy("payload_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("payload_md5")
    )
