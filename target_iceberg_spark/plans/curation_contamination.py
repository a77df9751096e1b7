"""Cross-source contamination matrix (SURVEY.md §2B curation north
star, round 7, post-window).

text_decontaminate strikes docs that leak a FIXED benchmark set;
this audits leakage BETWEEN corpus sources: for every ordered source
pair (A, B), how many of A's distinct 8-grams also occur in B, and
what share of A's gram vocabulary that is — the matrix that catches
mirror sites, syndicated feeds, and benchmark text republished inside
a crawl source (the train/test contamination vector of Dodge et al.,
EMNLP'21 §4, measured here between sources instead of against a
benchmark file).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

CONT_N = 8  # gram width (the text_dup_ngram_fraction convention)
CONT_DF_CAP = 20  # drop grams in more docs (boilerplate, not leakage)


@register(
    "curation_cross_contamination",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT DISTINCT doc_id, source,
           md5(array_to_string(t[i : i + {CONT_N} - 1], ' ')) AS g
    FROM toks,
         LATERAL (SELECT unnest(range(1, len(t) - {CONT_N} + 2)) AS i)
    WHERE len(t) >= {CONT_N}
),
kept AS (
    SELECT g FROM (SELECT g, COUNT(*) AS df FROM grams GROUP BY g)
    WHERE df <= {CONT_DF_CAP}
),
sg AS (
    SELECT DISTINCT source, g FROM grams JOIN kept USING (g)
),
vocab AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams FROM sg GROUP BY source
),
shared AS (
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM sg a JOIN sg b ON a.g = b.g AND a.source <> b.source
    GROUP BY a.source, b.source
)
SELECT s.source_a, s.source_b, s.n_shared,
       ROUND(s.n_shared / CAST(v.n_grams AS DOUBLE), 4) AS share_of_a
FROM shared s JOIN vocab v ON v.source = s.source_a
ORDER BY s.source_a, s.source_b
""",
    tags=("curation", "contamination", "dedup"),
)
def curation_cross_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional contamination matrix: n_shared = distinct
    {CONT_N}-gram digests source A shares with source B, share_of_a =
    that count over A's gram vocabulary. Grams in more than
    {CONT_DF_CAP} documents are dropped first — corpus-wide
    boilerplate is dup_ngram_fraction's business, not cross-source
    leakage — which also caps every posting list before the pair
    join (the winnowing/tfidf valve, mirrored in the oracle).

    Scale shape: grams shuffle as 16-byte digests; the df cap bounds
    the (source, gram) self-join's per-gram fanout at
    min(|sources|, {CONT_DF_CAP})²; vocab sizes and pair counts are
    combinable; the matrix is ≤ |sources|² rows. At 100 TB the sg
    table persists as the per-source gram index and new sources join
    against it incrementally (the text_ngram_novelty firsts-table
    discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", "source", F.split("text", " ").alias("t"))
        .where(F.size("t") >= CONT_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - CONT_N + 1),
                    lambda i: F.md5(F.array_join(F.slice("t", i, CONT_N), " ")),
                )
            ).alias("g"),
        )
        .distinct()
        # localCheckpoint: the gram table feeds BOTH the df filter and
        # the source-pair join, and Catalyst does no cross-branch CSE
        # — without it the tokenize→slice→md5 explode (the dominant
        # map CPU) runs twice. The dedup_incremental case (expensive
        # shared subtree), NOT the join_interval_overlap case (cheap
        # scan branches): measured 5.6 -> 2.9 s warm at sf0.1.
        .localCheckpoint()
    )
    kept = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= CONT_DF_CAP)
        .select("g")
    )
    # sg feeds three consumers (vocab, both sides of the pair join);
    # it is (source, gram)-distinct — bounded by |sources| x vocab —
    # so cut the lineage once rather than re-running the df-cap join
    # per consumer (round 13, guide §2.4).
    sg = grams.join(kept, "g").select("source", "g").distinct().localCheckpoint()
    vocab = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = sg.select(F.col("source").alias("source_a"), "g")
    b = sg.select(F.col("source").alias("source_b"), "g")
    shared = (
        a.join(b, "g")
        .where(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(vocab.withColumnRenamed("source", "source_a")),
            "source_a",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.col("n_grams").cast("double"), 4
            ).alias("share_of_a"),
        )
        .orderBy("source_a", "source_b")
    )
