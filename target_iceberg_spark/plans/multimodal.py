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
