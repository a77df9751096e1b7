"""Cross-split contamination audit (SURVEY.md §2B curation tier,
round 11, post-window).

curation_split proves the hash split is stable; text_decontaminate
scrubs an external benchmark. The gap between them is SPLIT HYGIENE:
held-out docs that share long n-grams with the training side leak the
test set into training (the train/test overlap problem documented for
GPT-2/3-era corpora and every dedup paper since — e.g. Lee et al.
2022 "Deduplicating Training Data Makes Language Models Better",
public). This audit runs the SAME md5 split as curation_split, marks
every test doc sharing an 8-gram digest with ANY train doc, and
reports per-source contamination.

Scale shape: only 16-byte gram digests shuffle, never text. The train
gram vocabulary is a distinct-aggregate (Zipf-bounded); the test-side
check is one equi-join of test-doc gram digests against it followed
by a combinable per-doc ANY and a per-source rollup. Same digest
discipline as text_decontaminate / curation_cross_contamination; no
windows, no all-pairs anything.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.hashing import hex_int, hex_int_sql
from target_iceberg_spark.functions.textfns import ngrams_of, tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

DECON_N = 8  # shared-n-gram length that counts as leakage
DECON_TRAIN_HI = 90  # md5 bucket < this -> train (same as curation_split)
DECON_TEST_LO = 95  # md5 bucket >= this -> test


@register(
    "curation_split_decontam",
    oracle=f"""
WITH labeled AS (
    SELECT doc_id, source, text,
           {hex_int_sql("md5(CAST(doc_id AS VARCHAR))")} % 100 AS bucket
    FROM documents
),
toks AS (
    SELECT doc_id, source, bucket, string_split(lower(text), ' ') AS t
    FROM labeled
),
grams AS (
    SELECT doc_id, source, bucket,
           md5(array_to_string(t[i : i + {DECON_N} - 1], ' ')) AS g
    FROM toks,
         LATERAL (SELECT unnest(range(1, len(t) - {DECON_N} + 2)) AS i)
    WHERE len(t) >= {DECON_N}
),
train_grams AS (
    SELECT DISTINCT g FROM grams WHERE bucket < {DECON_TRAIN_HI}
),
test_docs AS (
    SELECT doc_id, source,
           MAX(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS contaminated
    FROM grams gr LEFT JOIN train_grams tg USING (g)
    WHERE gr.bucket >= {DECON_TEST_LO}
    GROUP BY doc_id, source
),
split_sizes AS (
    SELECT source,
           CAST(COUNT(*) FILTER (WHERE bucket < {DECON_TRAIN_HI}) AS BIGINT)
               AS n_train,
           CAST(COUNT(*) FILTER (WHERE bucket >= {DECON_TEST_LO}) AS BIGINT)
               AS n_test
    FROM labeled GROUP BY source
)
SELECT s.source, s.n_train, s.n_test,
       CAST(COALESCE(SUM(td.contaminated), 0) AS BIGINT)
           AS n_test_contaminated,
       ROUND(COALESCE(SUM(td.contaminated), 0)
             / CAST(GREATEST(s.n_test, 1) AS DOUBLE), 4)
           AS contamination_rate
FROM split_sizes s
LEFT JOIN test_docs td ON td.source = s.source
GROUP BY s.source, s.n_train, s.n_test
ORDER BY s.source
""",
    tags=("curation", "splitting", "decontamination", "dedup"),
)
def curation_split_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination of the md5 hash split's test bucket:
    a test doc is contaminated when any of its {DECON_N}-gram digests
    also occurs in ANY train doc. Reports split sizes, contaminated
    test docs, and the contamination rate — the split-hygiene number a
    training pipeline must watch before trusting held-out metrics.

    Note test docs shorter than {DECON_N} tokens carry no grams and
    count as clean (matching the oracle's LEFT JOIN of sizes to the
    gram-bearing test docs).

    Scale shape: digest-only shuffles; train vocabulary is a distinct
    aggregate; one equi-join + per-doc ANY + per-source rollup."""
    # fanout A/B'd round 13 and REJECTED (off 1.95 s -> on 1.95 s,
    # flat): the train-gram distinct's shuffle already spreads the
    # dominant work, so the extra exchange buys nothing.
    docs = load_table(spark, sf_dir, "documents")
    bucket = hex_int(F.md5(F.col("doc_id").cast("string"))).cast("bigint") % 100
    labeled = docs.select("doc_id", "source", "text", bucket.alias("bucket"))
    # materialize the token array BEFORE shingling (ngrams_of contract:
    # an inline tokens() expression re-splits per lambda element)
    toks_col = labeled.withColumn("t", tokens("text"))
    grams = toks_col.select(
        "doc_id",
        "source",
        "bucket",
        F.explode(
            F.transform(ngrams_of("t", DECON_N), lambda ng: F.md5(ng))
        ).alias("g"),
    )
    train_grams = (
        grams.where(F.col("bucket") < DECON_TRAIN_HI).select("g").distinct()
    )
    test_docs = (
        grams.where(F.col("bucket") >= DECON_TEST_LO)
        .join(
            train_grams.select(F.col("g").alias("tg")),
            F.col("g") == F.col("tg"),
            "left",
        )
        .groupBy("doc_id", "source")
        .agg(
            F.max(
                F.when(F.col("tg").isNotNull(), 1).otherwise(0)
            ).alias("contaminated")
        )
    )
    split_sizes = labeled.groupBy("source").agg(
        F.count(F.when(F.col("bucket") < DECON_TRAIN_HI, 1))
        .cast("bigint")
        .alias("n_train"),
        F.count(F.when(F.col("bucket") >= DECON_TEST_LO, 1))
        .cast("bigint")
        .alias("n_test"),
    )
    return (
        split_sizes.join(
            test_docs.groupBy("source").agg(
                F.sum("contaminated").alias("_contam")
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "n_train",
            "n_test",
            F.coalesce("_contam", F.lit(0))
            .cast("bigint")
            .alias("n_test_contaminated"),
            F.round(
                F.coalesce("_contam", F.lit(0))
                / F.greatest("n_test", F.lit(1)).cast("double"),
                4,
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )
