"""Burrows' Delta stylometry between sources (SURVEY.md §2B text
tier, round 9).

Burrows' Delta (Burrows, LLC 2002; Evert et al. 2017 evaluation —
public) is the standard authorship / style distance: z-score each
source's relative frequency of the top-N corpus words (function words
dominate, which is why it fingerprints STYLE rather than topic), then
Delta(a, b) = mean |z_a - z_b| over those words. Corpus forensics
uses it to find sources that are the same upstream author/generator
in disguise — the stylistic sibling of curation_cross_contamination's
verbatim-leakage matrix.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

DELTA_WORDS = 30  # top corpus words (the marker-word panel)
DELTA_TOP = 10  # closest source pairs reported


@register(
    "text_burrows_delta",
    oracle=f"""
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
topw AS (
    SELECT w FROM tok GROUP BY w
    ORDER BY COUNT(*) DESC, w LIMIT {DELTA_WORDS}
),
stot AS (
    SELECT source, COUNT(*) AS n FROM tok GROUP BY source
),
grid AS (
    SELECT s.source, t.w, s.n
    FROM (SELECT DISTINCT source, n FROM stot) s, topw t
),
cnt AS (
    SELECT source, w, COUNT(*) AS c FROM tok
    WHERE w IN (SELECT w FROM topw)
    GROUP BY source, w
),
freq AS (
    SELECT g.source, g.w,
           COALESCE(cnt.c, 0) / CAST(g.n AS DOUBLE) AS f
    FROM grid g LEFT JOIN cnt ON g.source = cnt.source AND g.w = cnt.w
),
zs AS (
    SELECT source, w,
           (f - AVG(f) OVER (PARTITION BY w))
               / STDDEV_SAMP(f) OVER (PARTITION BY w) AS z
    FROM freq
)
SELECT a.source AS source_a, b.source AS source_b,
       ROUND(AVG(ABS(a.z - b.z)), 6) AS delta
FROM zs a JOIN zs b ON a.w = b.w AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY delta, source_a, source_b
LIMIT {DELTA_TOP}
""",
    tags=("text", "stylometry", "curation"),
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {DELTA_TOP} stylistically closest source pairs by Burrows'
    Delta over the top-{DELTA_WORDS} corpus words: per-source relative
    frequencies on the (source x marker-word) grid — ABSENT words
    count as frequency 0, which the grid materializes explicitly —
    z-scored per word across sources, then mean |z_a - z_b| per pair.

    Scale shape: the one token-volume stage is the combinable
    (source, word) count; the marker panel is a top-{DELTA_WORDS}
    TakeOrderedAndProject; everything after lives on the |sources| x
    {DELTA_WORDS} grid (bounded by catalog metadata, not corpus
    size), including the per-word z windows and the pair self-join.
    The same plan at 100 TB changes only the first groupBy's input."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    topw = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .orderBy(F.desc("cw"), "w")
        .limit(DELTA_WORDS)
        .select("w")
    )
    stot = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    cnt = (
        tok.join(F.broadcast(topw), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = stot.crossJoin(F.broadcast(topw))
    freq = grid.join(cnt, ["source", "w"], "left").select(
        "source",
        "w",
        (F.coalesce("c", F.lit(0)) / F.col("n").cast("double")).alias("f"),
    )
    from pyspark.sql import Window

    wz = Window.partitionBy("w")
    zs = freq.select(
        "source",
        "w",
        (
            (F.col("f") - F.avg("f").over(wz))
            / F.stddev_samp("f").over(wz)
        ).alias("z"),
    )
    a = zs.select(
        F.col("source").alias("source_a"), "w", F.col("z").alias("za")
    )
    b = zs.select(
        F.col("source").alias("source_b"),
        F.col("w").alias("wb"),
        F.col("z").alias("zb"),
    )
    return (
        a.join(
            b,
            (F.col("w") == F.col("wb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.round(F.avg(F.abs(F.col("za") - F.col("zb"))), 6).alias("delta"))
        .orderBy("delta", "source_a", "source_b")
        .limit(DELTA_TOP)
    )
