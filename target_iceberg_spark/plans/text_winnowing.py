"""Winnowing document fingerprints (SURVEY.md §2B text/dedup tier,
round-6 post-window).

The MOSS local fingerprinting algorithm (Schleimer, Schmidt & Aiken,
SIGMOD'03, public): hash every k-gram, slide a window of w consecutive
hashes, keep each window's MINIMUM — the selected set is a
position-robust fingerprint guaranteeing any shared run of length
k+w-1 is detected. Complements the dedup family: minhash estimates
whole-document similarity; winnowing localizes SHARED PASSAGES
(plagiarism / quote / boilerplate detection), which whole-doc
sketches dilute away.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.textfns import ngrams_of, tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

WIN_K = 5  # tokens per k-gram
WIN_W = 4  # window of consecutive k-gram hashes
WIN_MIN_SHARED = 2  # report pairs sharing >= this many fingerprints
WIN_DF_CAP = 20  # drop fingerprints appearing in more docs (boilerplate)


@register(
    "text_winnowing",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id, i - 1 AS p,
           md5(list_aggregate(toks[i:i+{WIN_K - 1}], 'string_agg', ' ')) AS h
    FROM t, unnest(range(1, len(toks) - {WIN_K - 2})) AS u(i)
),
wmins AS (
    SELECT doc_id,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN CURRENT ROW
                        AND {WIN_W - 1} FOLLOWING) AS h,
           p,
           COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
    FROM grams
),
fps AS (
    SELECT DISTINCT doc_id, h
    FROM wmins WHERE p <= n_grams - {WIN_W}
),
rare AS (
    SELECT h FROM fps GROUP BY h
    HAVING COUNT(*) BETWEEN 2 AND {WIN_DF_CAP}
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
    JOIN rare ON rare.h = a.h
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared
FROM pairs WHERE n_shared >= {WIN_MIN_SHARED}
ORDER BY doc_a, doc_b
""",
    tags=("text", "dedup", "fingerprint"),
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-passage candidate pairs via winnowing: every {WIN_K}-gram
    is md5-hashed, each {WIN_W}-window's MINIMUM hash is selected
    (per-position window min, distinct per doc), and documents sharing
    >= {WIN_MIN_SHARED} selected fingerprints are reported with the
    overlap count — the MOSS guarantee that any shared token run of
    length {WIN_K + WIN_W - 1}+ surfaces, localized rather than
    diluted into a whole-doc similarity.

    Scale shape: grams shuffle nowhere — the window min runs inside
    the doc-partitioned window (bounded, the whitelisted class) and
    only the DISTINCT winnowed fingerprints (a ~2/(w+1) fraction of
    grams, the paper's density bound) leave the document as 32-char
    digests. The pair join is posting-list bounded by the SAME
    discipline as sim_tfidf_pairs: fingerprints seen in more than
    {WIN_DF_CAP} docs are boilerplate and are EXCLUDED before the
    self-join (the cap is part of the contract, mirrored in the
    oracle), so no posting list can go quadratic. Window-min ties
    need no tie-break: equal hashes mean equal grams, and the
    DISTINCT collapses them."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    grams = t.select(
        "doc_id",
        F.posexplode(F.transform(ngrams_of("toks", WIN_K), F.md5)).alias(
            "p", "h"
        ),
    )
    by_doc = Window.partitionBy("doc_id")
    wmin = by_doc.orderBy("p").rowsBetween(0, WIN_W - 1)
    wmins = grams.select(
        "doc_id",
        F.min("h").over(wmin).alias("h"),
        "p",
        F.count(F.lit(1)).over(by_doc).alias("n_grams"),
    )
    # localCheckpoint (round 13): fps feeds THREE consumers (the df
    # valve + both sides of the pair self-join); without the cut each
    # re-ran the scan->tokenize->window->distinct lineage. The
    # materialized table is doc x fingerprint digests at the paper's
    # ~2/(w+1) density — bounded — while every removed re-execution
    # is a full corpus pass at 100 TB.
    fps = (
        wmins.where(F.col("p") <= F.col("n_grams") - WIN_W)
        .select("doc_id", "h")
        .distinct()
        .localCheckpoint()
    )
    rare = (
        fps.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= WIN_DF_CAP))
        .select("h")
    )
    a = fps.alias("a")
    b = fps.alias("b")
    pairs = (
        a.join(rare, "h")
        .join(b, "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= WIN_MIN_SHARED)
    )
    return pairs.orderBy("doc_a", "doc_b")
