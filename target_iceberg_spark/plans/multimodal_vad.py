"""Voice-activity segmentation over multimodal payloads (SURVEY.md
§2B multimodal tier, round 7, post-window).

The audio leg's first preprocessing pass: slice the waveform into
frames, compute per-frame ENERGY, threshold against the clip's own
mean, and report the activity segments (energy-based VAD — the
classic pre-neural gate, e.g. ITU-T G.729B's energy term; modern
pipelines still run it as the cheap first filter before a model).
The codec is the tier's honest deterministic fake (payload bytes AS
the signal), so the Arrow stage is SQL-mirrored and hash-checked;
with a real decoder only the per-frame energy source changes.

Reuses multimodal_scene_cuts' frame algebra: same 64-byte frames,
energy = the same 16 block sums' total — one shared derivation, two
different temporal statistics (scene_cuts diffs adjacent signatures;
VAD thresholds and runs gaps-and-islands).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.multimodal import attach_payload
from target_iceberg_spark.plans.multimodal_scenes import (
    SC_FRAME_BYTES,
    SC_MIN_FRAMES,
    _frame_hash_sql,
)
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "multimodal_vad_segments",
    oracle=f"""
WITH {_frame_hash_sql()},
stats AS (
    SELECT doc_id, SUM(tot) AS tot_all, COUNT(*) AS nf
    FROM sig GROUP BY doc_id
),
flags AS (
    SELECT s.doc_id, s.f,
           CASE WHEN s.tot * st.nf > st.tot_all THEN 1 ELSE 0 END AS act
    FROM sig s JOIN stats st USING (doc_id)
),
marks AS (
    SELECT doc_id, f, act,
           CASE WHEN act = 1 AND COALESCE(
                    LAG(act) OVER (PARTITION BY doc_id ORDER BY f), 0) = 0
                THEN 1 ELSE 0 END AS seg_start
    FROM flags
),
isl AS (
    SELECT doc_id, act,
           SUM(seg_start) OVER (PARTITION BY doc_id ORDER BY f
                                ROWS UNBOUNDED PRECEDING) AS seg
    FROM marks
),
seg_len AS (
    SELECT doc_id, seg, CAST(COUNT(*) AS BIGINT) AS len
    FROM isl WHERE act = 1 GROUP BY doc_id, seg
)
SELECT st.doc_id,
       CAST(st.nf AS BIGINT) AS n_frames,
       CAST(COALESCE(SUM(sl.len), 0) AS BIGINT) AS n_active,
       CAST(COUNT(sl.seg) AS BIGINT) AS n_segments,
       CAST(COALESCE(MAX(sl.len), 0) AS BIGINT) AS longest_run
FROM stats st LEFT JOIN seg_len sl ON sl.doc_id = st.doc_id
GROUP BY st.doc_id, st.nf
ORDER BY st.doc_id
""",
    tags=("multimodal", "audio", "vad"),
)
def multimodal_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold VAD per payload: frames of {SC_FRAME_BYTES}
    bytes, a frame is ACTIVE iff its energy exceeds the clip mean
    (compared as energy·n_frames > total_energy — pure integer
    arithmetic, bit-exact in both engines, no float threshold), and
    activity runs become segments: (n_frames, n_active, n_segments,
    longest_run) per document.

    Scale shape: the multimodal_scene_cuts discipline — ONE
    Arrow-batched mapInPandas pass; a document's frames are
    consecutive bytes of its own payload, so the two sweeps
    (energy+mean, then flags+runs) are executor-LOCAL sequential work
    inside the batch and only the 4-number summary leaves the stage.
    No explode, no window, no shuffle of frame rows. The oracle
    re-derives the identical chain relationally (unnest → energy →
    LAG/cumsum islands), cross-checking the fused loop against the
    declarative form."""
    docs = attach_payload(
        load_table(spark, sf_dir, "documents").where(
            F.col("n_chars") >= SC_MIN_FRAMES * SC_FRAME_BYTES
        )
    )

    def vad_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                nf = len(raw) // SC_FRAME_BYTES
                energies = [
                    sum(raw[f * SC_FRAME_BYTES : (f + 1) * SC_FRAME_BYTES])
                    for f in range(nf)
                ]
                tot = sum(energies)
                active = [e * nf > tot for e in energies]
                n_active = sum(active)
                n_seg = longest = run = 0
                for a in active:
                    if a:
                        run += 1
                        if run == 1:
                            n_seg += 1
                        longest = max(longest, run)
                    else:
                        run = 0
                out.append((int(doc_id), nf, n_active, n_seg, longest))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_frames", "n_active", "n_segments",
                    "longest_run",
                ],
            )

    return (
        docs.select("doc_id", "payload")
        .mapInPandas(
            vad_batches,
            "doc_id LONG, n_frames LONG, n_active LONG, "
            "n_segments LONG, longest_run LONG",
        )
        .orderBy("doc_id")
    )
