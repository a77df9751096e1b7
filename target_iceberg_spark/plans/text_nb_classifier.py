"""Distributed Naive-Bayes language classifier — train, score, and
evaluate in one job (SURVEY.md §2B text tier, round 10).

text_langid is the n-gram HEURISTIC (stopword hit rates); production
pipelines (fastText's langid, CCNet — public) use a TRAINED linear
model. Multinomial Naive Bayes is the one trained classifier whose
fit is literally a groupBy: per-class token log-likelihoods
ln P(w|c) = ln((c(w,c)+1)/(T_c+V)) and priors ln P(c), so the whole
train -> predict -> confusion-matrix loop is expressible as counts
and joins in both engines — a real trained-model operator with an
exact oracle, no RNG and no gradient loop.

Resubstitution evaluation (train and score on the same corpus) is
deliberate and stated: the point is the distributed TRAINER shape,
and the confusion matrix makes the quality measurable either way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.textfns import tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


# Shared train->score->argmax CTEs ending at `pred (doc_id, true_lang,
# pred_lang)`. Reused verbatim by eval_macro_f1's oracle so the
# classifier and its evaluation score with literally the same SQL.
#
# Round 12: token instances are pre-aggregated to per-(doc, tok)
# COUNTS before the grid join, and scores sum cnt * logp — identical
# algebra, but the expensive (doc, class) aggregate consumes
# |doc x unique-tok| x |classes| rows instead of
# |token instances| x |classes| (the per-doc duplication factor, ~8x
# on this fixture). cw/vocab also derive from the counted table, so
# the corpus-sized explode feeds exactly ONE combinable groupBy.
NB_PRED_CTES = """toks AS (
    SELECT doc_id, lang,
           unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
),
cls AS (
    SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS n_docs,
           LN(COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents))
               AS log_prior
    FROM documents GROUP BY lang
),
dtok AS (
    SELECT doc_id, lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks GROUP BY doc_id, lang, tok
),
cw AS (
    SELECT tok, lang AS c, CAST(SUM(cnt) AS BIGINT) AS cwc
    FROM dtok GROUP BY tok, lang
),
vocab AS (SELECT DISTINCT tok FROM cw),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM vocab),
tc AS (SELECT c, SUM(cwc) AS t_c FROM cw GROUP BY c),
grid AS (
    SELECT vo.tok, cl.c,
           LN((COALESCE(cw.cwc, 0) + 1) / (tc.t_c + v.v)) AS logp
    FROM vocab vo
    CROSS JOIN cls cl
    CROSS JOIN v
    JOIN tc ON tc.c = cl.c
    LEFT JOIN cw ON cw.tok = vo.tok AND cw.c = cl.c
),
scores AS (
    SELECT t.doc_id, t.lang AS true_lang, g.c,
           ROUND(SUM(t.cnt * g.logp) + ANY_VALUE(cl.log_prior), 6) AS score
    FROM dtok t
    JOIN grid g ON g.tok = t.tok
    JOIN cls cl ON cl.c = g.c
    GROUP BY t.doc_id, t.lang, g.c
),
pred AS (
    SELECT doc_id, true_lang, c AS pred_lang
    FROM (SELECT doc_id, true_lang, c,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, c) AS rn
          FROM scores)
    WHERE rn = 1
)"""


@register(
    "text_nb_langid",
    oracle=f"""
WITH {NB_PRED_CTES}
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
""",
    tags=("text", "classifier", "langid", "ml"),
)
def text_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NB language classifier trained distributedly:
    Laplace-smoothed per-class token log-likelihoods over the full
    vocab x class grid (zeros included via left join — absent tokens
    still carry smoothed mass), doc scores = sum of token logps +
    class prior, argmax per doc, confusion matrix vs the true lang.

    On the synthetic fixture every token occurs in every language (the
    lang column is drawn independently of the text), so resubstitution
    accuracy sits near the class prior — expected, and the driver hash
    pins that exact confusion matrix; the ALGORITHM's separating power
    is pinned in tests on a planted two-language corpus where the same
    plan must score a perfect diagonal.

    Scale shape: the corpus-sized explode feeds exactly ONE combinable
    groupBy (per-(doc, tok) counts); train tables and the score join
    all run over that deduplicated table, the scoring grid is
    vocabulary x classes — Zipf-bounded, never corpus-bounded — and
    the argmax is a (doc)-partitioned window over |classes| rows.
    Scores round to 6 before the argmax so a cross-engine sum-order
    ulp cannot flip a prediction (ties then break on class name)."""
    return nb_confusion(load_table(spark, sf_dir, "documents"))


def nb_confusion(docs: DataFrame) -> DataFrame:
    """Train-score-evaluate multinomial NB on (doc_id, lang, text):
    the full operator body, factored so tests can run it on planted
    corpora with known separability."""
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("tok")
    )
    # The ONE corpus-sized aggregate: per-(doc, tok) counts. Everything
    # downstream works on this ~8x smaller table (round 12).
    dtok = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    cls_counts = docs.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = cls_counts.agg(F.sum("n_docs").cast("double").alias("nd"))
    cls = cls_counts.crossJoin(F.broadcast(tot)).select(
        "c", F.log(F.col("n_docs") / F.col("nd")).alias("log_prior")
    )
    cw = dtok.groupBy("tok", F.col("lang").alias("c")).agg(
        F.sum("cnt").cast("bigint").alias("cwc")
    )
    vocab = cw.select("tok").distinct()
    v = vocab.agg(F.count(F.lit(1)).cast("double").alias("v"))
    tc = cw.groupBy("c").agg(F.sum("cwc").alias("t_c"))
    grid = (
        vocab.crossJoin(F.broadcast(cls.select("c")))
        .crossJoin(F.broadcast(v))
        .join(F.broadcast(tc), "c")
        .join(cw, ["tok", "c"], "left")
        .select(
            "tok",
            "c",
            F.log(
                (F.coalesce(F.col("cwc"), F.lit(0)) + 1) / (F.col("t_c") + F.col("v"))
            ).alias("logp"),
        )
    )
    scores = (
        dtok.join(grid, "tok")
        .join(F.broadcast(cls.select("c", "log_prior")), "c")
        .groupBy(F.col("doc_id"), F.col("lang").alias("true_lang"), F.col("c"))
        .agg(
            F.round(
                F.sum(F.col("cnt") * F.col("logp")) + F.any_value("log_prior"), 6
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "c")
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("true_lang", F.col("c").alias("pred_lang"))
    )
    conf = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # Cut lineage before the final sort: a global orderBy's range
    # partitioner SAMPLES its child, which would execute the whole
    # corpus-sized prediction pipeline a second time. Checkpointing
    # the |classes|^2-row matrix makes the sort (and eval_macro_f1's
    # three metric branches) re-read ~25 materialized rows instead
    # (measured: 2x warm time without this, at every scale).
    return conf.localCheckpoint().orderBy("true_lang", "pred_lang")
