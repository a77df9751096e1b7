"""Content-defined chunking dedup (SURVEY.md §2B dedup north star,
round-5 post-window tier).

Fixed-width shingles (text_dup_ngram_fraction) and fixed-stride chunks
(text_chunk_overlap) both break when a single word is inserted — every
downstream window shifts. Content-DEFINED chunking (the FastCDC / LBFS
family) places chunk boundaries where the CONTENT says so (words whose
hash falls in a target residue class), so an edit only perturbs the
one chunk containing it and every other chunk digest survives — the
shift-robust signal storage dedup systems and large-corpus near-dup
pipelines rely on.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.hashing import hex_int, hex_int_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

CDC_MODULUS = 8  # E[chunk] = 8 words: boundary where md5(word) % 8 == 0
CDC_SHARED_MIN_DOCS = 2


@register(
    "dedup_cdc_chunks",
    oracle=f"""
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
),
b AS (
    SELECT doc_id, pos, word,
           SUM(CASE WHEN {hex_int_sql("md5(word)", 1, 2)}
                         % {CDC_MODULUS} = 0
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS chunk_id
    FROM w
),
chunks AS (
    SELECT doc_id, chunk_id,
           md5(string_agg(word, ' ' ORDER BY pos)) AS d
    FROM b GROUP BY doc_id, chunk_id
),
freq AS (
    SELECT d, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY d
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN f.nd >= {CDC_SHARED_MIN_DOCS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shared,
       ROUND(SUM(CASE WHEN f.nd >= {CDC_SHARED_MIN_DOCS} THEN 1.0 ELSE 0.0 END)
             / COUNT(*), 6) AS shared_frac
FROM chunks c JOIN freq f USING (d)
GROUP BY c.doc_id
""",
    tags=("dedup", "cdc", "chunking"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shift-robust containment via content-defined
    chunks: boundaries fall on words whose md5 lands in residue 0 mod
    8 (expected chunk ~8 words), each chunk is digested, and a chunk
    digest appearing in >= 2 distinct documents marks shared
    content. Unlike the fixed 8-gram
    fraction (text_dup_ngram_fraction), inserting one word upstream
    does NOT invalidate every downstream chunk — only the chunk
    containing the edit changes.

    Scale shape: the chunk-id assignment is a running sum over each
    document's OWN words (window partitioned by doc_id, bounded by doc
    length); chunk digests — 16 bytes, never chunk text — are what
    shuffles for the frequency count (combinable) and the rejoin
    (equi-join on digest); the per-doc rollup is a partial-combining
    aggregate. At 100 TB the chunk-digest frequency table is the
    persisted dedup index incremental batches join against, and the
    residue modulus tunes chunk size without changing the plan."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    flag = (
        hex_int(F.md5("word"), 1, 2).cast("int") % CDC_MODULUS == 0
    ).cast("long")
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = words.withColumn("chunk_id", F.sum(flag).over(win))
    chunks = b.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda x: x["word"],
                ),
                " ",
            )
        ).alias("d")
    )
    freq = chunks.groupBy("d").agg(
        (F.count_distinct("doc_id") >= CDC_SHARED_MIN_DOCS).alias("shared")
    )
    j = chunks.join(freq, "d")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("shared").cast("long")).alias("n_shared"),
        F.round(
            F.sum(F.col("shared").cast("double")) / F.count(F.lit(1)), 6
        ).alias("shared_frac"),
    )
