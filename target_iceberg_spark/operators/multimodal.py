"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a metadata struct,
processed by Arrow-batched ``mapInPandas`` — the shape a real decode /
feature-extract / resize / frame-sample stage takes at scale (payload
bytes never leave the executor; one Python worker per partition; batch
size bounded by spark.sql.execution.arrow.maxRecordsPerBatch).

The actual codec step is STUBBED: the image/audio libraries are not in
this container, so ``decode_image_meta`` raises NotImplementedError
unless a decoder import succeeds, and the pipeline defaults to a
deterministic fake decoder driven by the payload bytes. The Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested (tests/test_operators.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

try:  # real decoder, absent in this environment
    from PIL import Image  # noqa: F401

    HAVE_IMAGE_DECODER = True
except ImportError:
    HAVE_IMAGE_DECODER = False

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, kind string, width int, height int, checksum long"
)


def decode_image_meta(payload: bytes) -> dict:
    """Real decode path — requires an image library.

    Raises NotImplementedError in this container; ``fake_decode_meta``
    is the deterministic stand-in the pipeline uses instead.
    """
    if not HAVE_IMAGE_DECODER:
        raise NotImplementedError(
            "image decoding requires PIL/libvips; not available in this "
            "environment — pipeline uses fake_decode_meta instead"
        )
    raise NotImplementedError("wire Image.open(io.BytesIO(payload)) here")


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake 'decode': derive (width, height, checksum)
    purely from the payload bytes so tests are reproducible."""
    checksum = sum(payload[:64])
    width = 64 + checksum % 512
    height = 64 + (checksum // 7) % 512
    return width, height, checksum


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: binary payload column + metadata
    struct (media kind, byte size) — BinaryType + StructType plumbing."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.octet_length(payload).alias("n_bytes"),
        ),
    )


def decode_meta_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: per-Arrow-batch fake decode of payload bytes."""
    for pdf in it:
        meta = [fake_decode_meta(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "kind": "image/fake",
                "width": pd.Series([m[0] for m in meta], dtype="int32"),
                "height": pd.Series([m[1] for m in meta], dtype="int32"),
                "checksum": pd.Series([m[2] for m in meta], dtype="int64"),
            }
        )


def decode_pipeline(df: DataFrame) -> DataFrame:
    """payload-bearing df -> decoded metadata via Arrow-batched
    mapInPandas (executor-side, no driver collect)."""
    return df.select("doc_id", "payload").mapInPandas(
        decode_meta_batches, schema=DECODE_SCHEMA
    )


RESIZE_STRIDE = 2  # fake "resize": keep every 2nd byte of the payload

RESIZE_SCHEMA = (
    "doc_id long, orig_bytes int, resized_bytes int, "
    "resized_md5 string, pix_sum long"
)


def fake_resize(payload: bytes, stride: int = RESIZE_STRIDE) -> bytes:
    """Deterministic fake 'resize': 1-D stride decimation of the
    payload bytes — the stand-in for a real interpolating downscale
    (which needs an image library). Pure byte math, so the whole
    Python stage is SQL-mirrorable and hash-checked."""
    return payload[::stride]


def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: per-Arrow-batch fake resize + output digest.

    The resized payload itself stays executor-side; only its size,
    md5, and pixel-sum feature leave the stage — the discipline a real
    resize stage follows (write resized bytes to the sink table,
    surface digests for verification)."""
    import hashlib

    for pdf in it:
        resized = [fake_resize(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": pdf["payload"].map(len).astype("int32"),
                "resized_bytes": pd.Series([len(r) for r in resized], dtype="int32"),
                "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
                "pix_sum": pd.Series([sum(r) for r in resized], dtype="int64"),
            }
        )


def resize_pipeline(df: DataFrame) -> DataFrame:
    """payload-bearing df -> resized-payload digests via Arrow-batched
    mapInPandas (executor-side, no driver collect)."""
    return df.select("doc_id", "payload").mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA
    )
