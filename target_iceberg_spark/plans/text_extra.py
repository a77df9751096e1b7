"""Corpus-statistics extras: PMI collocation mining (SURVEY.md §2B
text-analysis north star).

Pointwise mutual information over corpus bigrams is the classic
collocation detector (Church & Hanks 1990): pmi(x,y) =
ln(p(xy) / (p(x)p(y))) with p(xy) from bigram counts and p(x) from
unigram counts. Training-data pipelines use it to find multi-word
expressions worth preserving as units and to spot templated/boilerplate
phrase patterns.

Everything is count aggregation + one ln(), so the whole query is
whole-stage-codegen expressions with an exact DuckDB mirror.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.textfns import ngrams_of, tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PMI_MIN_COUNT = 20  # ignore rare bigrams: PMI is unstable at low counts


@register(
    "text_pmi_bigrams",
    oracle=f"""
WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
uni AS (SELECT unnest(toks) AS tok FROM t),
ucnt AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
bg AS (
    SELECT unnest(list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM t
),
bcnt AS (SELECT bigram, COUNT(*) AS n_xy FROM bg GROUP BY bigram),
tot AS (SELECT (SELECT COUNT(*) FROM uni) AS w, (SELECT COUNT(*) FROM bg) AS b)
SELECT bigram,
       CAST(n_xy AS BIGINT) AS n_xy,
       ROUND(LN((n_xy * 1.0 * w * w) / (b * 1.0 * cx.c * cy.c)), 5) + 0.0 AS pmi
FROM bcnt, tot
JOIN ucnt cx ON cx.tok = string_split(bigram, ' ')[1]
JOIN ucnt cy ON cy.tok = string_split(bigram, ' ')[2]
WHERE n_xy >= {PMI_MIN_COUNT}
""",
    tags=("text", "curation"),
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation scores for corpus bigrams seen >= PMI_MIN_COUNT
    times: two map-side-combinable counts (unigrams, bigrams), two
    scalar totals broadcast as a one-row cross join, and two joins of
    the bigram table back to the unigram counts on the split words.
    Both count tables are vocabulary-sized (bounded by Zipf, not by
    corpus rows), so at 100 TB the joins stay small-side-broadcastable
    or cheaply shuffled; corpus text is scanned exactly twice."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(tokens("text").alias("_toks"))
    uni = toked.select(F.explode("_toks").alias("tok"))
    ucnt = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    bg = toked.select(F.explode(ngrams_of("_toks", 2)).alias("bigram"))
    bcnt = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .where(F.col("n_xy") >= PMI_MIN_COUNT)
    )
    tot = uni.agg(F.count(F.lit(1)).alias("w")).crossJoin(
        bg.agg(F.count(F.lit(1)).alias("b"))
    )
    w1 = F.split(F.col("bigram"), " ").getItem(0)
    w2 = F.split(F.col("bigram"), " ").getItem(1)
    return (
        bcnt.crossJoin(F.broadcast(tot))
        .join(ucnt.alias("cx"), w1 == F.col("cx.tok"))
        .join(ucnt.alias("cy"), w2 == F.col("cy.tok"))
        .select(
            "bigram",
            F.col("n_xy").cast("long").alias("n_xy"),
            # + 0.0 canonicalizes IEEE -0.0 (ln of a ratio infinitesimally
            # below 1 rounds to -0.0 in one engine, +0.0 in the other)
            (
                F.round(
                    F.log(
                        (F.col("n_xy") * F.lit(1.0) * F.col("w") * F.col("w"))
                        / (F.col("b") * F.lit(1.0) * F.col("cx.c") * F.col("cy.c"))
                    ),
                    5,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )
