"""Multi-class precision / recall / F1 evaluation (SURVEY.md §2B
ML-evaluation tier, round 11, post-window).

The eval tier has threshold-free metrics (agg_auc_roc, agg_pr_auc),
calibration (agg_calibration_ece) and agreement (agg_cohens_kappa);
the missing everyday readout is the per-class table every multi-class
classifier report leads with: precision, recall, F1 per class plus
macro (unweighted class mean) and micro (pooled counts) summaries
(standard definitions, e.g. Manning/Raghavan/Schütze IR book §13.1 —
public). Evaluated on the trained NB language classifier so the whole
train -> predict -> evaluate loop is distributed and oracle-exact:
both arms reuse text_nb_classifier's shared prediction stage verbatim
(NB_PRED_CTES / nb_confusion).

Determinism: counts are integers; precision/recall round to 6 and F1
is computed FROM the rounded pair, so both engines derive summary
rows from identical doubles.

Scale shape: everything downstream of the prediction stage runs over
the |classes|-bounded confusion matrix — three tiny aggregates, two
broadcast joins, two one-row summary aggregates. The prediction stage
itself is the vocabulary-bounded NB shape documented in
text_nb_classifier.py, and it runs ONCE: the confusion matrix is
localCheckpoint-ed before the three metric branches fan out (round 11
recomputed it three times — the whole 3.2 s / 3.57x-at-10x cost the
round-11 verdict flagged). A sparse decomposition of the NB score
join (observed (tok, class) counts + closed-form absent-token mass)
was measured and REJECTED: on this fixture every token occurs in
every class, so it saved nothing and its docs x classes assembly join
pushed the 10x ratio from ~3.6 to ~6-7.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.text_nb_classifier import (
    NB_PRED_CTES,
    nb_confusion,
)
from target_iceberg_spark.sources.tables import load_table

MACRO_LABEL = "__macro__"
MICRO_LABEL = "__micro__"


@register(
    "eval_macro_f1",
    oracle=f"""
WITH {NB_PRED_CTES},
conf AS (
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY true_lang, pred_lang
),
per_true AS (
    SELECT true_lang AS label, CAST(SUM(n) AS BIGINT) AS support
    FROM conf GROUP BY true_lang
),
per_pred AS (
    SELECT pred_lang AS label, CAST(SUM(n) AS BIGINT) AS predicted
    FROM conf GROUP BY pred_lang
),
diag AS (
    SELECT true_lang AS label, CAST(SUM(n) AS BIGINT) AS tp
    FROM conf WHERE true_lang = pred_lang GROUP BY true_lang
),
per_class AS (
    SELECT t.label,
           COALESCE(d.tp, 0) AS tp,
           COALESCE(p.predicted, 0) - COALESCE(d.tp, 0) AS fp,
           t.support - COALESCE(d.tp, 0) AS fn,
           t.support,
           ROUND(COALESCE(d.tp, 0)
                 / CAST(GREATEST(COALESCE(p.predicted, 0), 1) AS DOUBLE), 6)
               AS precision,
           ROUND(COALESCE(d.tp, 0) / CAST(t.support AS DOUBLE), 6) AS recall
    FROM per_true t
    LEFT JOIN per_pred p USING (label)
    LEFT JOIN diag d USING (label)
),
scored AS (
    SELECT label, tp, fp, fn, support, precision, recall,
           ROUND(CASE WHEN precision + recall = 0 THEN 0
                      ELSE 2 * precision * recall / (precision + recall)
                 END, 6) AS f1
    FROM per_class
)
SELECT * FROM scored
UNION ALL
SELECT '{MACRO_LABEL}', CAST(SUM(tp) AS BIGINT), CAST(SUM(fp) AS BIGINT),
       CAST(SUM(fn) AS BIGINT), CAST(SUM(support) AS BIGINT),
       ROUND(AVG(precision), 6), ROUND(AVG(recall), 6), ROUND(AVG(f1), 6)
FROM scored
UNION ALL
SELECT '{MICRO_LABEL}', CAST(SUM(tp) AS BIGINT), CAST(SUM(fp) AS BIGINT),
       CAST(SUM(fn) AS BIGINT), CAST(SUM(support) AS BIGINT),
       ROUND(SUM(tp) / CAST(SUM(support) AS DOUBLE), 6),
       ROUND(SUM(tp) / CAST(SUM(support) AS DOUBLE), 6),
       ROUND(SUM(tp) / CAST(SUM(support) AS DOUBLE), 6)
FROM scored
ORDER BY label
""",
    tags=("ml-eval", "classifier", "f1", "langid"),
)
def eval_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 for the trained NB language
    classifier, plus '{MACRO_LABEL}' (unweighted class means; counts
    are pooled totals) and '{MICRO_LABEL}' (pooled counts — for
    single-label multi-class, micro-P = micro-R = accuracy) summary
    rows. F1 derives from the ROUNDED precision/recall pair in both
    engines.

    Scale shape: reuses nb_confusion's prediction stage; every metric
    stage after it is |classes|-bounded. The |classes|^2-row confusion
    matrix arrives localCheckpoint-ed from nb_confusion, so the three
    metric branches (per-true, per-pred, diagonal) read the
    materialized table instead of re-running the corpus-sized
    prediction pipeline three times."""
    conf = nb_confusion(load_table(spark, sf_dir, "documents"))
    per_true = conf.groupBy(F.col("true_lang").alias("label")).agg(
        F.sum("n").cast("bigint").alias("support")
    )
    per_pred = conf.groupBy(F.col("pred_lang").alias("label")).agg(
        F.sum("n").cast("bigint").alias("predicted")
    )
    diag = (
        conf.where(F.col("true_lang") == F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("label"))
        .agg(F.sum("n").cast("bigint").alias("tp"))
    )
    tp = F.coalesce("tp", F.lit(0))
    predicted = F.coalesce("predicted", F.lit(0))
    per_class = (
        per_true.join(F.broadcast(per_pred), "label", "left")
        .join(F.broadcast(diag), "label", "left")
        .select(
            "label",
            tp.cast("bigint").alias("tp"),
            (predicted - tp).cast("bigint").alias("fp"),
            (F.col("support") - tp).cast("bigint").alias("fn"),
            "support",
            F.round(
                tp / F.greatest(predicted, F.lit(1)).cast("double"), 6
            ).alias("precision"),
            F.round(tp / F.col("support").cast("double"), 6).alias("recall"),
        )
    )
    scored = per_class.select(
        "*",
        F.round(
            F.when(F.col("precision") + F.col("recall") == 0, 0.0).otherwise(
                2
                * F.col("precision")
                * F.col("recall")
                / (F.col("precision") + F.col("recall"))
            ),
            6,
        ).alias("f1"),
    )
    acc = F.round(F.sum("tp") / F.sum("support").cast("double"), 6)
    macro = scored.agg(
        F.sum("tp").cast("bigint").alias("tp"),
        F.sum("fp").cast("bigint").alias("fp"),
        F.sum("fn").cast("bigint").alias("fn"),
        F.sum("support").cast("bigint").alias("support"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("f1"), 6).alias("f1"),
    ).select(F.lit(MACRO_LABEL).alias("label"), "*")
    micro = scored.agg(
        F.sum("tp").cast("bigint").alias("tp"),
        F.sum("fp").cast("bigint").alias("fp"),
        F.sum("fn").cast("bigint").alias("fn"),
        F.sum("support").cast("bigint").alias("support"),
        acc.alias("precision"),
        acc.alias("recall"),
        acc.alias("f1"),
    ).select(F.lit(MICRO_LABEL).alias("label"), "*")
    return scored.unionAll(macro).unionAll(micro).orderBy("label")
