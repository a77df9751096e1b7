"""Interpolated Kneser-Ney bigram scoring (SURVEY.md §2B text tier,
round 10).

text_bigram_lm smooths with add-k — fine for ranking, but the LM
literature's standard since Kneser & Ney (ICASSP 1995) and Chen &
Goodman (1998, both public) is absolute discounting with a
CONTINUATION-count backoff: how many distinct contexts a word
completes matters more than how often it occurs ("Francisco" is
frequent but only ever follows "San"). Every quantity is a count over
the bigram TYPE table, so the whole model — discount, backoff weight,
continuation distribution — fits in the same vocabulary-bounded
join shape as the add-k model:

    P_KN(w2|w1) = max(c(w1 w2) - D, 0)/c(w1.)
                  + D * N1+(w1 .)/c(w1.) * N1+(. w2)/N1+(. .)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.textfns import ngrams_of, tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

KN_D = 0.75  # absolute discount (Chen & Goodman's fixed-D variant)

# Shared scoring CTEs: fit the KN model tables and emit one nll per
# bigram occurrence. Reused verbatim by text_kn_perplexity's oracle so
# the fit and the filter score with literally the same SQL.
KN_SCORED_CTES = f"""
t AS (
    SELECT doc_id, source, string_split(lower(text), ' ') AS toks
    FROM documents
),
bg AS (
    SELECT doc_id, source,
           unnest(list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM t
),
c12 AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY bigram),
ctx AS (
    SELECT string_split(bigram, ' ')[1] AS w1,
           SUM(c12) AS c1,
           CAST(COUNT(*) AS BIGINT) AS n1p_fwd
    FROM c12 GROUP BY string_split(bigram, ' ')[1]
),
cont AS (
    SELECT string_split(bigram, ' ')[2] AS w2,
           CAST(COUNT(*) AS BIGINT) AS n1p_bwd
    FROM c12 GROUP BY string_split(bigram, ' ')[2]
),
types AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_types FROM c12),
scored AS (
    SELECT bg.doc_id, bg.source,
           -LN(GREATEST(c12.c12 - {KN_D}, 0) / ctx.c1
               + {KN_D} * ctx.n1p_fwd / ctx.c1
                 * cont.n1p_bwd / ty.n_types) AS nll
    FROM bg
    JOIN c12 USING (bigram)
    JOIN ctx ON ctx.w1 = string_split(bg.bigram, ' ')[1]
    JOIN cont ON cont.w2 = string_split(bg.bigram, ' ')[2]
    CROSS JOIN types ty
)"""


@register(
    "text_kneser_ney",
    oracle=f"""
WITH {KN_SCORED_CTES},
per_doc AS (
    SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n_bg, AVG(nll) AS ce
    FROM scored GROUP BY source, doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bg) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ce), 4) AS mean_kn_cross_entropy
FROM per_doc GROUP BY source ORDER BY source
""",
    tags=("text", "lm", "quality"),
)
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean cross-entropy under an interpolated Kneser-Ney
    bigram model fit on the corpus: absolute discount {KN_D} off every
    seen bigram, mass redistributed through the continuation
    distribution N1+(.w2)/N1+(..) weighted by the per-context type
    count N1+(w1.) — the Chen-Goodman fixed-discount recipe.

    Scale shape: identical to text_bigram_lm — all four model tables
    (bigram counts, forward context stats, backward continuation
    counts, the 1-row type total) derive from ONE vocabulary-bounded
    bigram-type aggregate, so the scoring joins shuffle occurrence
    rows against Zipf-bounded count tables; nothing in the model
    grows with corpus size, only with vocabulary. Every scored bigram
    was seen in training (same-corpus fit), so the max(c-D,0) term is
    never the only mass and the log argument is strictly positive."""
    scored = kn_scored(spark, sf_dir)
    per_doc = scored.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bg"), F.avg("nll").alias("ce")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bg").cast("bigint").alias("n_bigrams"),
            F.round(F.avg("ce"), 4).alias("mean_kn_cross_entropy"),
        )
        .orderBy("source")
    )


def kn_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, nll) — one row per bigram occurrence, scored
    against the corpus-fit KN model. The Spark twin of KN_SCORED_CTES;
    shared by the fit report above and text_kn_perplexity's filter.

    Round-13 restructure (optimization guide §1.2 step 1 / §2.4): the
    nll depends only on the bigram TYPE, so the whole model collapses
    to ONE vocabulary-bounded (bigram, nll) table that the occurrence
    stream joins once. The pre-r13 shape scored occurrences against
    c12/ctx/cont/types separately, and InferFiltersFromConstraints
    pushed a DIFFERENT join-key null filter into each model subtree
    (isnotnull(bigram) vs isnotnull(split(bigram)[0]) vs none), so the
    four c12 exchanges never canonicalized equal, exchange reuse could
    not fire, and the full scan+tokenize+explode ran FIVE times per
    query (~0.5-0.6 s single-task CPU each at sf0.1, profiled stages
    71-74+92). Now the corpus is exploded exactly TWICE: once into the
    checkpointed c12 (vocabulary-sized — the checkpoint cuts lineage so
    ctx/cont/types and the model assembly all read c12's blocks instead
    of re-deriving it under divergent pushed filters), once as the
    probe side. Unlike the REJECTED round-12 plain-c12 checkpoint, the
    probe join keeps its broadcast via the explicit hint, so no
    AQE-demotion-to-SMJ cost appears. Per-bigram nll is the identical
    expression over identical inputs as before — computed once per
    type instead of once per occurrence, so results are bit-exact."""
    bg, _, model = kn_parts(spark, sf_dir)
    return bg.join(F.broadcast(model), "bigram").select(
        "doc_id", "source", "nll"
    )


def kn_parts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bg, c12, model): the bigram occurrence stream, the checkpointed
    vocabulary-sized bigram-type counts, and the per-bigram KN nll
    model table. Shared so consumers that need extra per-bigram
    signals (text_lm_contrast's unigram arm) derive them from the SAME
    checkpointed c12 instead of re-exploding the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", tokens("text").alias("toks"))
    bg = t.select(
        "doc_id", "source", F.explode(ngrams_of("toks", 2)).alias("bigram")
    )
    c12 = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .localCheckpoint()
    )
    w1 = F.split(F.col("bigram"), " ").getItem(0)
    w2 = F.split(F.col("bigram"), " ").getItem(1)
    ctx = c12.groupBy(w1.alias("w1")).agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).cast("bigint").alias("n1p_fwd")
    )
    cont = c12.groupBy(w2.alias("w2")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p_bwd")
    )
    types = c12.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    model = (
        c12.withColumn("_w1", w1)
        .withColumn("_w2", w2)
        .join(ctx, F.col("_w1") == F.col("w1"))
        .join(cont, F.col("_w2") == F.col("w2"))
        .crossJoin(F.broadcast(types))
        .select(
            "bigram",
            (
                -F.log(
                    F.greatest(F.col("c12") - F.lit(KN_D), F.lit(0.0)) / F.col("c1")
                    + F.lit(KN_D)
                    * F.col("n1p_fwd")
                    / F.col("c1")
                    * F.col("n1p_bwd")
                    / F.col("n_types")
                )
            ).alias("nll"),
        )
    )
    return bg, c12, model
