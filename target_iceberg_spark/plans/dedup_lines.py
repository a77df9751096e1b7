"""Segment-level corpus deduplication — the FineWeb / CCNet "line
dedup" (SURVEY.md §2B dedup north star, round-5 post-window).

Document-level dedup (plans/dedup.py) drops whole near-identical
documents; the complementary public technique (CCNet, Penedo et al.
FineWeb 2024) removes REPEATED SPANS from otherwise-unique documents —
boilerplate headers, navigation chrome, license blocks — by hashing
each line across the whole corpus and deleting lines that appear in
too many distinct documents. The synthetic documents table has no
newlines, so the unit here is a fixed-width word segment
(SEG_WORDS-word tiles at fixed positions) — the mechanics (segment ->
corpus-wide frequency -> surgical removal -> reassembly) are identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SEG_WORDS = 3  # segment width (words); 3 gives real cross-doc repeats
SEG_MIN_DOCS = 2  # a segment present in >= this many docs is removed


@register(
    "dedup_lines",
    oracle=f"""
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
e AS (
    SELECT doc_id, words,
           unnest(range(1, CAST(ceil(len(words) / {SEG_WORDS}.0) AS BIGINT)
                        + 1)) AS i
    FROM d
),
s AS (
    SELECT doc_id, CAST(i AS INT) AS seg_idx,
           array_to_string(
               list_slice(words, (i - 1) * {SEG_WORDS} + 1,
                          i * {SEG_WORDS}), ' ') AS seg_text
    FROM e
),
c AS (
    SELECT seg_text, COUNT(DISTINCT doc_id) AS n_docs
    FROM s GROUP BY seg_text
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN n_docs >= {SEG_MIN_DOCS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(length(COALESCE(
            string_agg(CASE WHEN n_docs < {SEG_MIN_DOCS} THEN seg_text END,
                       ' ' ORDER BY seg_idx), ''))
            AS BIGINT) AS clean_len
FROM s JOIN c USING (seg_text)
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
    tags=("dedup", "lines", "corpus"),
)
def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style segment dedup: tile each document into
    SEG_WORDS-word segments (a row-local transform over the split
    array — no shuffle to segment), count DISTINCT documents per
    segment corpus-wide, surgically delete segments seen in >=
    SEG_MIN_DOCS documents, and reassemble the survivors in original
    order. Reports per document: total segments, dropped segments, and
    the cleaned text length.

    Scale shape: the corpus-wide stage is one map-side-combinable
    distinct-count keyed by segment text — exactly the key frequency
    skews on (boilerplate), which is why the rejoin is an equi-join on
    seg_text where the frequent keys carry a TINY build side (one
    count row each); AQE handles residual skew. Reassembly is a
    per-document sort of ITS OWN segments (array_sort over a collected
    struct list, bounded by document length, never corpus size). The
    removal is surgical — unique content in a document that shares
    boilerplate survives, which document-level dedup cannot do."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    words = F.split("text", " ")
    n_seg = F.ceil(F.size(words) / F.lit(SEG_WORDS)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(1), n_seg),
        lambda i: F.struct(
            i.alias("seg_idx"),
            F.concat_ws(
                " ", F.slice(words, (i - 1) * SEG_WORDS + 1, SEG_WORDS)
            ).alias("seg_text"),
        ),
    )
    exploded = docs.select(
        "doc_id", F.explode(segs).alias("seg")
    ).select("doc_id", "seg.seg_idx", "seg.seg_text")
    counts = exploded.groupBy("seg_text").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    joined = exploded.join(counts, "seg_text")
    kept_struct = F.when(
        F.col("n_docs") < SEG_MIN_DOCS, F.struct("seg_idx", "seg_text")
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum((F.col("n_docs") >= SEG_MIN_DOCS).cast("int")).alias(
                "n_dropped"
            ),
            F.length(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["seg_text"],
                    ),
                )
            )
            .cast("bigint")
            .alias("clean_len"),
        )
        .orderBy("doc_id")
    )
