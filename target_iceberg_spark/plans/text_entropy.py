"""Character-entropy quality signal (SURVEY.md §2B text tier,
round 9).

Character-level Shannon entropy separates natural text (~4 bits/char
in English) from the two failure modes length/stopword filters miss:
low-entropy junk (repeated padding, base64-free boilerplate runs) and
high-entropy noise (random keys, minified blobs). Gopher/RefinedWeb-
class pipelines keep a character-distribution signal in the quality
stack for exactly this band-pass reason (Rae et al. 2021 §A.1.1,
public). Entropy is computed on a fixed-length document PREFIX so the
per-document cost is a plan constant, not a document-length tax.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ENTROPY_PREFIX = 256  # chars scored per doc — plan constant
ENTROPY_LOW = 3.0  # bits/char; below = repetitive junk watchlist


@register(
    "text_char_entropy",
    oracle=f"""
WITH chars AS (
    SELECT doc_id, source,
           substring(text, i.i, 1) AS ch
    FROM documents,
         LATERAL (SELECT unnest(range(1, LEAST(len(text), {ENTROPY_PREFIX}) + 1)) AS i) i
    WHERE len(text) > 0
),
freq AS (
    SELECT doc_id, source, ch, COUNT(*) AS c
    FROM chars GROUP BY 1, 2, 3
),
tot AS (
    SELECT doc_id, source, SUM(c) AS n FROM freq GROUP BY 1, 2
),
ent AS (
    SELECT f.doc_id, f.source,
           -SUM((f.c / t.n) * log2(f.c / t.n)) AS h
    FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id, f.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(h), 4) AS avg_entropy,
       ROUND(MIN(h), 4) AS min_entropy,
       CAST(COUNT(*) FILTER (WHERE h < {ENTROPY_LOW}) AS BIGINT)
           AS n_low_entropy
FROM ent
GROUP BY source
ORDER BY source
""",
    tags=("text", "quality", "entropy"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-entropy profile: Shannon entropy
    (bits/char) of each document's first {ENTROPY_PREFIX} characters,
    rolled up to per-source mean, minimum, and a count of documents
    under the {ENTROPY_LOW}-bit junk watermark.

    Scale shape: the char fan-out is capped at {ENTROPY_PREFIX} rows
    per document (a plan constant — long documents cost the same as
    short ones), per-(doc, char) counts and the per-doc entropy fold
    are both combinable groupBys keyed by doc_id (uniform, skew-free),
    and the source rollup is a final low-cardinality aggregate.
    p*log2(p) runs identically on both engines' doubles; the 4-decimal
    round absorbs the sum-order ulp.

    Zero-length documents are filtered BEFORE the char fan-out in
    both arms: Spark's sequence(1, 0) auto-steps DESCENDING to [1, 0]
    (two empty-char rows) while DuckDB's range(1, 1) is empty, so an
    unguarded empty doc would be counted by the plan but dropped by
    the oracle (ADVICE r9)."""
    docs = load_table(spark, sf_dir, "documents", fanout=True).filter(
        F.length("text") > 0
    )
    chars = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.length("text"), F.lit(ENTROPY_PREFIX)),
                ),
                lambda i: F.substring(F.col("text"), i, F.lit(1)),
            )
        ).alias("ch"),
    )
    freq = chars.groupBy("doc_id", "source", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = freq.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    ent = (
        freq.join(tot, "doc_id")
        .groupBy("doc_id", "source")
        .agg((-F.sum(p * F.log2(p))).alias("h"))
    )
    return (
        ent.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("h"), 4).alias("avg_entropy"),
            F.round(F.min("h"), 4).alias("min_entropy"),
            F.sum(F.when(F.col("h") < ENTROPY_LOW, 1).otherwise(0))
            .cast("bigint")
            .alias("n_low_entropy"),
        )
        .orderBy("source")
    )
