"""Scene-cut detection over multimodal binary payloads (SURVEY.md §2B
multimodal tier, round-6 post-window).

Completes the video leg of the tier: framesample extracts frames,
phash fingerprints whole payloads — this diffs CONSECUTIVE frame
fingerprints to find shot boundaries, the standard first pass of every
video-dedup / keyframe-extraction pipeline (threshold on the Hamming
distance between adjacent perceptual hashes, public technique used by
pHash/videohash tooling). The codec is the tier's honest deterministic
fake (payload bytes AS the signal, operators/multimodal.py), so the
Arrow stage is SQL-mirrored and hash-checked end-to-end; with a real
decoder only the per-frame signal source changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.multimodal import attach_payload
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SC_FRAME_BYTES = 64  # one fake "frame" per 64 payload bytes
SC_BLOCKS = 16  # bits per frame signature
SC_BLOCK_BYTES = SC_FRAME_BYTES // SC_BLOCKS  # 4 bytes averaged per bit
SC_CUT_HAM = 10  # adjacent-frame Hamming >= this => scene cut
SC_MIN_FRAMES = 2


def _frame_block_sql(k: int) -> str:
    terms = " + ".join(
        f"ord(substr(text, CAST(f * {SC_FRAME_BYTES} + {k * SC_BLOCK_BYTES + i + 1} AS INT), 1))"
        for i in range(SC_BLOCK_BYTES)
    )
    return f"({terms})"


def _frame_hash_sql() -> str:
    blocks = ", ".join(_frame_block_sql(k) for k in range(SC_BLOCKS))
    bits = " + ".join(
        f"(CASE WHEN {SC_BLOCKS} * b[{k + 1}] > tot THEN {1 << k} ELSE 0 END)"
        for k in range(SC_BLOCKS)
    )
    return f"""
frames AS (
    SELECT doc_id,
           unnest(range(0, CAST(FLOOR(n_chars / {SC_FRAME_BYTES}) AS BIGINT)))
        AS f, text
    FROM documents
    WHERE n_chars >= {SC_MIN_FRAMES * SC_FRAME_BYTES}
),
sig AS (
    SELECT doc_id, f, b, list_sum(b) AS tot
    FROM (SELECT doc_id, f, [{blocks}] AS b FROM frames)
),
hashes AS (SELECT doc_id, f, CAST({bits} AS BIGINT) AS fh FROM sig)"""


@register(
    "multimodal_scene_cuts",
    oracle=f"""
WITH {_frame_hash_sql()},
diffs AS (
    SELECT doc_id, f, fh,
           LAG(fh) OVER (PARTITION BY doc_id ORDER BY f) AS prev_fh
    FROM hashes
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(*) FILTER (
           WHERE bit_count(CAST(xor(fh, prev_fh) AS BIGINT)) >= {SC_CUT_HAM}
       ) AS BIGINT) AS n_cuts,
       ROUND(COUNT(*) FILTER (
           WHERE bit_count(CAST(xor(fh, prev_fh) AS BIGINT)) >= {SC_CUT_HAM}
       ) * 1.0 / (COUNT(*) - 1), 6) AS cut_rate
FROM diffs
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("multimodal", "video", "scenes"),
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection per payload: slice each payload into
    {SC_FRAME_BYTES}-byte fake frames, fingerprint every frame with a
    {SC_BLOCKS}-bit average-hash (bit k set iff {SC_BLOCKS}·block_k >
    frame_total — integer-exact, no division), and count a scene CUT
    wherever adjacent frames' fingerprints differ by Hamming >=
    {SC_CUT_HAM}. Reports (n_frames, n_cuts, cut_rate) per document
    with >= {SC_MIN_FRAMES} frames.

    Scale shape: ONE Arrow-batched mapInPandas pass — a document's
    frames are consecutive bytes of its own payload, so the
    frame-to-frame diff is executor-LOCAL sequential work inside the
    batch (exactly how a real decoder emits per-shot features): no
    explode, no window, no shuffle of frame rows at all; only the
    3-number per-doc summary leaves the stage. The oracle re-derives
    the identical chain relationally (unnest frames -> LAG window) —
    the cross-check that the fused Python loop and the declarative
    form agree. Per-doc work is O(payload bytes); a degenerate
    10 GB payload is the skew unit, mitigated upstream by byte-range
    splitting in a real container format."""
    docs = attach_payload(
        load_table(spark, sf_dir, "documents").where(
            F.col("n_chars") >= SC_MIN_FRAMES * SC_FRAME_BYTES
        )
    )

    def scene_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = len(raw) // SC_FRAME_BYTES
                hashes = []
                for f in range(n_frames):
                    frame = raw[
                        f * SC_FRAME_BYTES : (f + 1) * SC_FRAME_BYTES
                    ]
                    blocks = [
                        sum(
                            frame[
                                k * SC_BLOCK_BYTES : (k + 1) * SC_BLOCK_BYTES
                            ]
                        )
                        for k in range(SC_BLOCKS)
                    ]
                    tot = sum(blocks)
                    fh = 0
                    for k, b in enumerate(blocks):
                        if SC_BLOCKS * b > tot:
                            fh |= 1 << k
                    hashes.append(fh)
                n_cuts = sum(
                    1
                    for prev, cur in zip(hashes, hashes[1:])
                    if bin(prev ^ cur).count("1") >= SC_CUT_HAM
                )
                out.append((doc_id, n_frames, n_cuts))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_frames", "n_cuts"]
            )

    # the ratio is rounded JVM-side: Spark's ROUND is HALF_UP like
    # DuckDB's, while Python's built-in round() is banker's — rounding
    # inside the pandas stage would diverge on exact-half ratios
    return (
        docs.select("doc_id", "payload")
        .mapInPandas(
            scene_batches,
            "doc_id long, n_frames bigint, n_cuts bigint",
        )
        .select(
            "doc_id",
            "n_frames",
            "n_cuts",
            F.round(F.col("n_cuts") / (F.col("n_frames") - 1), 6).alias(
                "cut_rate"
            ),
        )
        .orderBy("doc_id")
    )
