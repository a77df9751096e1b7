"""Audio landmark fingerprinting (SURVEY.md §2B multimodal tier,
round 8).

The Shazam constellation algorithm (Wang, ISMIR 2003, public): find
local PEAKS in the signal's time-frequency energy, pair each anchor
peak with the next few peaks inside a fan-out window, hash
(anchor energy band, target energy band, frame delta) into a compact
landmark, and match recordings by COHERENT landmark hits — matches
whose anchor-time offsets agree. The offset-coherence vote is what
makes it robust: random hash collisions scatter across offsets,
true copies pile onto one.

The signal here is the tier's honest deterministic fake (payload
bytes AS the waveform, per the multimodal_vad/scene_cuts discipline):
per-frame byte-sum energies stand in for the spectrogram column. With
a real decoder only the energy source changes — the peak picking,
landmark hashing, df-capped matching, and coherence vote are the
production pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.multimodal import attach_payload
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

FP_FRAME_BYTES = 16  # finer frames than scene_cuts: peaks need extent
FP_MIN_FRAMES = 3  # need an interior frame to have a peak at all
FP_FAN = 8  # pair anchor with peaks <= this many frames ahead
FP_EBAND = 64  # energy band width (byte-sum units)
FP_DF_CAP = 20  # landmarks in more docs are noise: excluded
FP_MIN_COHERENT = 2  # report pairs with >= this many same-offset hits
FP_TOP = 15


def _fp_energy_terms() -> str:
    return " + ".join(
        f"ord(substr(text, CAST(f * {FP_FRAME_BYTES} + {i + 1} AS INT), 1))"
        for i in range(FP_FRAME_BYTES)
    )


@register(
    "multimodal_audio_fingerprint",
    oracle=f"""
WITH frames AS (
    SELECT doc_id,
           unnest(range(0, CAST(FLOOR(n_chars / {FP_FRAME_BYTES}) AS BIGINT)))
        AS f, text
    FROM documents WHERE n_chars >= {FP_MIN_FRAMES * FP_FRAME_BYTES}
),
sig AS (SELECT doc_id, f, ({_fp_energy_terms()}) AS e FROM frames),
pk AS (
    SELECT doc_id, f, e,
           LAG(e) OVER (PARTITION BY doc_id ORDER BY f) AS ep,
           LEAD(e) OVER (PARTITION BY doc_id ORDER BY f) AS en
    FROM sig
),
peaks AS (
    SELECT doc_id, f, e FROM pk
    WHERE ep IS NOT NULL AND en IS NOT NULL AND e > ep AND e >= en
),
fp AS (
    SELECT a.doc_id, a.f AS fa,
           CAST(a.e // {FP_EBAND} AS BIGINT) * 65536
           + CAST(b.e // {FP_EBAND} AS BIGINT) * 256
           + (b.f - a.f) AS h
    FROM peaks a JOIN peaks b
      ON a.doc_id = b.doc_id AND b.f - a.f BETWEEN 1 AND {FP_FAN}
),
dfh AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM fp GROUP BY h),
keep AS (SELECT h FROM dfh WHERE nd BETWEEN 2 AND {FP_DF_CAP}),
m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fa - b.fa AS off
    FROM fp a JOIN keep USING (h)
    JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
),
co AS (
    SELECT doc_a, doc_b, off, CAST(COUNT(*) AS BIGINT) AS c
    FROM m GROUP BY doc_a, doc_b, off
)
SELECT doc_a, doc_b,
       MAX(c) AS coherent_hits,
       CAST(SUM(c) AS BIGINT) AS total_hits
FROM co GROUP BY doc_a, doc_b
HAVING MAX(c) >= {FP_MIN_COHERENT}
ORDER BY coherent_hits DESC, total_hits DESC, doc_a, doc_b
LIMIT {FP_TOP}
""",
    tags=("multimodal", "audio", "fingerprint"),
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constellation matching across payloads: per-frame byte-sum
    energies ({FP_FRAME_BYTES}-byte frames), local peaks (strictly
    above the previous frame, at-or-above the next — deterministic at
    plateaus), landmarks = (anchor band, target band, Δf) for targets
    up to {FP_FAN} frames ahead, banded by {FP_EBAND} energy units.
    Cross-document matches vote by anchor-offset; pairs with
    >= {FP_MIN_COHERENT} same-offset hits are reported with their
    coherent and total hit counts.

    Scale shape: the signal stage is ONE Arrow-batched mapInPandas
    pass per document (frames never shuffle; numpy does the byte
    sums and peak scan in-batch) emitting compact (doc, frame, hash)
    landmark rows — the audio analogue of the text tier's
    digest-only shuffles. Matching is the df-capped posting-join
    discipline (landmarks in > {FP_DF_CAP} docs are silence/noise
    boilerplate and are excluded), the coherence vote is a combinable
    two-level aggregate, and the finisher is TakeOrderedAndProject.
    The oracle re-derives the identical chain relationally."""
    import numpy as np

    docs = attach_payload(
        load_table(spark, sf_dir, "documents").where(
            F.col("n_chars") >= FP_MIN_FRAMES * FP_FRAME_BYTES
        )
    )

    def fp_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_fa, out_h = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                nf = len(raw) // FP_FRAME_BYTES
                if nf < FP_MIN_FRAMES:
                    continue
                e = (
                    raw[: nf * FP_FRAME_BYTES]
                    .reshape(nf, FP_FRAME_BYTES)
                    .sum(axis=1)
                    .astype(np.int64)
                )
                is_peak = np.zeros(nf, dtype=bool)
                is_peak[1:-1] = (e[1:-1] > e[:-2]) & (e[1:-1] >= e[2:])
                pf = np.nonzero(is_peak)[0]
                for i, fa in enumerate(pf):
                    for fb in pf[i + 1 :]:
                        df = int(fb - fa)
                        if df > FP_FAN:
                            break
                        h = (
                            int(e[fa] // FP_EBAND) * 65536
                            + int(e[fb] // FP_EBAND) * 256
                            + df
                        )
                        out_doc.append(int(doc_id))
                        out_fa.append(int(fa))
                        out_h.append(h)
            yield pd.DataFrame(
                {"doc_id": out_doc, "fa": out_fa, "h": out_h}
            )

    fp = docs.select("doc_id", "payload").mapInPandas(
        fp_batches, "doc_id LONG, fa LONG, h LONG"
    )
    dfh = fp.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    keep = dfh.where(
        (F.col("nd") >= 2) & (F.col("nd") <= FP_DF_CAP)
    ).select("h")
    a, b = fp.alias("a"), fp.alias("b")
    m = (
        a.join(keep, "h")
        .join(b, "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (F.col("a.fa") - F.col("b.fa")).alias("off"),
        )
    )
    co = m.groupBy("doc_a", "doc_b", "off").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        co.groupBy("doc_a", "doc_b")
        .agg(
            F.max("c").alias("coherent_hits"),
            F.sum("c").cast("bigint").alias("total_hits"),
        )
        .where(F.col("coherent_hits") >= FP_MIN_COHERENT)
        .orderBy(
            F.desc("coherent_hits"), F.desc("total_hits"), "doc_a", "doc_b"
        )
        .limit(FP_TOP)
    )
