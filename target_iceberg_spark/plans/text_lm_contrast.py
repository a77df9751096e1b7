"""Context-gain (bigram-vs-unigram) contrast filter (SURVEY.md §2B
text tier, round 11, post-window).

Perplexity filters (text_kn_perplexity) kill docs a context model
finds SURPRISING; the complementary signal is docs where context
provides NO gain — the per-doc gap between the marginal unigram
cross-entropy and the conditional KN bigram cross-entropy on the same
prediction events. Templated/boilerplate/shuffled text scores low gain
(each word is predictable without its neighbor, or unpredictable
either way); natural prose scores high. Model-contrast scoring is the
same mechanism as DSIR's two-LM importance weights (Xie et al.,
NeurIPS 2023 — public), applied here as an intra-corpus quality
signal rather than a target-domain sampler.

Both cross-entropies are computed over the SAME events (each bigram
occurrence: KN predicts w2 from w1, the unigram baseline predicts w2
marginally), so the gap is a proper per-event log-likelihood-ratio
mean, and both per-doc means round to 6 before the subtraction —
identical doubles drive the flag in both engines.

Scale shape: the unigram table is one more vocabulary-bounded
aggregate over the bigram occurrences already materialized for the KN
join; everything else reuses the shared KN scoring stage
(plans/text_kneser_ney.py) plus two combinable rollups.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.text_kneser_ney import KN_SCORED_CTES, kn_parts

CONTRAST_MIN = 0.0  # context-free flag: bigram gain <= this (nats)


@register(
    "text_lm_contrast",
    oracle=f"""
WITH {KN_SCORED_CTES},
uni AS (
    SELECT string_split(bigram, ' ')[2] AS w2,
           CAST(COUNT(*) AS BIGINT) AS c2
    FROM bg GROUP BY 1
),
tot AS (SELECT CAST(SUM(c2) AS DOUBLE) AS t FROM uni),
uni_scored AS (
    SELECT bg.doc_id, -LN(u.c2 / t.t) AS unll
    FROM bg
    JOIN uni u ON u.w2 = string_split(bg.bigram, ' ')[2]
    CROSS JOIN tot t
),
kn_doc AS (
    SELECT doc_id, source, ROUND(AVG(nll), 6) AS ce_kn
    FROM scored GROUP BY doc_id, source
),
uni_doc AS (
    SELECT doc_id, ROUND(AVG(unll), 6) AS ce_uni FROM uni_scored GROUP BY 1
),
contrast AS (
    SELECT k.source, u.ce_uni - k.ce_kn AS gain
    FROM kn_doc k JOIN uni_doc u USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(gain), 4) AS mean_context_gain,
       CAST(COUNT(*) FILTER (WHERE gain <= {CONTRAST_MIN!r}) AS BIGINT)
           AS n_context_free,
       ROUND(AVG(CASE WHEN gain <= {CONTRAST_MIN!r} THEN 1.0 ELSE 0.0 END), 4)
           AS context_free_share
FROM contrast GROUP BY source ORDER BY source
""",
    tags=("text", "lm", "quality", "contrast"),
)
def text_lm_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source context-gain report: mean per-doc gap between
    unigram and KN-bigram cross-entropy over identical prediction
    events, and the share of docs with gain <= {CONTRAST_MIN} nats
    (context-free — the boilerplate/template signature).

    Scale shape: one extra vocabulary-bounded unigram aggregate beside
    the shared KN scoring stage; per-doc means and the per-source
    rollup are combinable; the doc-level join matches two
    already-aggregated doc tables."""
    # Round-13 restructure (guide §1.2 step 1 / §2.4, with the KN
    # family): the unigram model is also per-bigram-TYPE data —
    # c2(w2) = SUM(c12) GROUP BY w2 over the checkpointed bigram-type
    # table, identical integers to counting occurrences directly — so
    # both models join into ONE vocabulary-sized (bigram, nll, unll)
    # table and the corpus is probed ONCE for both cross-entropies
    # (pre-r13: a separate unigram explode+aggregate+probe beside the
    # KN stage — 4 more full scan+tokenize passes under divergent
    # pushed-down null filters). Per-event values are the identical
    # expressions over identical inputs; per-doc means round to 6
    # before the subtraction exactly as before.
    bg, c12, model = kn_parts(spark, sf_dir)
    w2 = F.split(F.col("bigram"), " ").getItem(1)
    uni = c12.groupBy(w2.alias("w2")).agg(
        F.sum("c12").cast("bigint").alias("c2")
    )
    tot = uni.agg(F.sum("c2").cast("double").alias("t"))
    umodel = (
        c12.withColumn("_w2", w2)
        .join(uni, F.col("_w2") == F.col("w2"))
        .crossJoin(F.broadcast(tot))
        .select("bigram", (-F.log(F.col("c2") / F.col("t"))).alias("unll"))
    )
    both = model.join(umodel, "bigram")
    per_doc = (
        bg.join(F.broadcast(both), "bigram")
        .groupBy("doc_id", "source")
        .agg(
            F.round(F.avg("nll"), 6).alias("ce_kn"),
            F.round(F.avg("unll"), 6).alias("ce_uni"),
        )
    )
    contrast = per_doc.select(
        "source", (F.col("ce_uni") - F.col("ce_kn")).alias("gain")
    )
    return (
        contrast.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("gain"), 4).alias("mean_context_gain"),
            F.count(F.when(F.col("gain") <= CONTRAST_MIN, 1))
            .cast("bigint")
            .alias("n_context_free"),
            F.round(
                F.avg(
                    F.when(F.col("gain") <= CONTRAST_MIN, 1.0).otherwise(0.0)
                ),
                4,
            ).alias("context_free_share"),
        )
        .orderBy("source")
    )
