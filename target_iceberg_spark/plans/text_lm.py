"""Bigram language-model scoring (SURVEY.md §2B text-analysis tier,
round-6 post-window).

text_perplexity scores documents under a unigram LM; real perplexity
filters (CCNet's KenLM stage, public) are n-gram models. This is the
distributed bigram step: an add-k-smoothed conditional model
P(w2|w1) = (c(w1 w2)+k) / (c(w1)+k|V|) fit on the corpus in the same
job, scoring every document's mean negative log-likelihood — the
quality signal that separates fluent text from token salad better than
unigram frequency alone, expressed entirely as counts + joins so it
runs JVM-side and has an exact DuckDB mirror.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.textfns import ngrams_of, tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

LM_K = 0.5  # add-k smoothing mass


@register(
    "text_bigram_lm",
    oracle=f"""
WITH t AS (
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
c1 AS (
    SELECT string_split(bigram, ' ')[1] AS w1, SUM(c12) AS c1
    FROM c12 GROUP BY string_split(bigram, ' ')[1]
),
v AS (
    SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
    FROM (SELECT unnest(toks) AS tok FROM t)
),
scored AS (
    SELECT bg.doc_id, bg.source,
           -LN((c12.c12 + {LM_K}) / (c1.c1 + {LM_K} * v.v)) AS nll
    FROM bg
    JOIN c12 USING (bigram)
    JOIN c1 ON c1.w1 = string_split(bg.bigram, ' ')[1]
    CROSS JOIN v
),
per_doc AS (
    SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n_bg, AVG(nll) AS ce
    FROM scored GROUP BY source, doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bg) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ce), 4) AS mean_cross_entropy
FROM per_doc GROUP BY source ORDER BY source
""",
    tags=("text", "lm", "quality"),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean bigram cross-entropy under an add-{LM_K}
    smoothed conditional LM fit on the corpus itself: P(w2|w1) =
    (c(w1 w2)+{LM_K})/(c(w1)+{LM_K}|V|), each document scored by the
    mean -ln P over its bigrams, rolled up per source — the n-gram
    upgrade of text_perplexity's unigram filter and the cheap stand-in
    for the KenLM stage of CCNet-style curation (public recipe).

    Scale shape: identical discipline to text_pmi_bigrams — the bigram
    and context-count tables are vocabulary-bounded (Zipf), not
    corpus-bounded, so the two scoring joins shuffle the occurrence
    table on compact token keys against count tables that are
    broadcastable in practice; the context counts derive FROM the
    bigram counts (one extra combinable groupBy, no third corpus
    scan); |V| is a one-row broadcast cross join. The per-doc average
    then the per-source average are both combinable. ROUND(...,4) at
    the end only — the text_perplexity float discipline."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", tokens("text").alias("toks"))
    bg = t.select(
        "doc_id", "source", F.explode(ngrams_of("toks", 2)).alias("bigram")
    )
    # Round-13 restructure (guide §1.2 step 1, the KN-family pattern —
    # see plans/text_kneser_ney.py::kn_parts): nll depends only on the
    # bigram TYPE, so fold c12/c1/|V| into ONE vocabulary-sized
    # (bigram, nll) model and probe the occurrence stream once. The
    # checkpoint stops InferFiltersFromConstraints' divergent null
    # filters from splitting the c12 exchange into unreusable copies
    # (pre-r13: c12, c1 and the scoring join each re-ran the full
    # scan+tokenize+explode single-task). |V| keeps its own unigram
    # pass: single-token docs contribute vocabulary but no bigram, so
    # it is NOT derivable from c12. Identical arithmetic per bigram;
    # results bit-exact.
    c12 = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .localCheckpoint()
    )
    w1_of = F.split(F.col("bigram"), " ").getItem(0)
    c1 = c12.groupBy(w1_of.alias("w1")).agg(F.sum("c12").alias("c1"))
    v = t.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").cast("double").alias("v")
    )
    model = (
        c12.withColumn("_w1", w1_of)
        .join(c1, F.col("_w1") == F.col("w1"))
        .crossJoin(F.broadcast(v))
        .select(
            "bigram",
            (
                -F.log(
                    (F.col("c12") + LM_K)
                    / (F.col("c1") + LM_K * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    scored = bg.join(F.broadcast(model), "bigram").select(
        "doc_id", "source", "nll"
    )
    per_doc = scored.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bg"),
        F.avg("nll").alias("ce"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bg").cast("bigint").alias("n_bigrams"),
            F.round(F.avg("ce"), 4).alias("mean_cross_entropy"),
        )
        .orderBy("source")
    )
