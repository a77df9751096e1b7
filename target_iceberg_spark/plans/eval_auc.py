"""ROC-AUC and PR-AUC via grouped rank identities (SURVEY.md §2B
ML-evaluation tier, rounds 10-11).

A pipeline that trains quality classifiers (text_nb_langid,
text_quality_trained) needs to EVALUATE them at corpus scale. AUC is
the standard threshold-free metric, and the rank-sum identity
AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) (Hanley & McNeil
1982; the Mann-Whitney U equivalence, public) needs only RANKS — and
with mid-rank ties, every row in a tied score group shares one
midrank, so the whole statistic collapses onto the DISTINCT-score
table:

    midrank(g) = n_total - cum_n(g) + (n(g) + 1) / 2
    R_pos      = sum over groups of tp(g) * midrank(g)

(cum_n = cumulative count from the TOP score down to and including g).
No per-row rank window exists anywhere: both metrics run off one
combinable per-(scorer, score) aggregate plus distributed cumulative
sums — the exact-prefix-sum recipe agg_decile_lift established
(range-repartition on the sort key, within-partition cumsums,
per-partition offsets over <= partitions x scorers rows), because a
CONTINUOUS scorer's distinct-score table is itself corpus-sized and a
per-scorer window would serialize it into one task.

Two scorers are evaluated against the length label in the same plan —
a signal scorer (token count: near-perfect by construction, tokens
track chars) and a null scorer (stopword share: uninformative for
length) — so the outputs self-validate: AUC_signal >> AUC_null ~ 0.5
and AP_signal >> AP_null ~ prevalence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

AUC_LABEL_CHARS = 200  # positive class: n_chars >= this
AUC_STOPWORDS = ("the", "a", "of", "and", "to")


def _stops_sql() -> str:
    return ", ".join(f"'{w}'" for w in AUC_STOPWORDS)


def _scored_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(y, scorer, s): both scorers' per-doc scores, stacked."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(w) for w in AUC_STOPWORDS])
    scored = docs.select(
        F.when(F.col("n_chars") >= AUC_LABEL_CHARS, 1).otherwise(0).alias("y"),
        F.size(toks).cast("double").alias("s_signal"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
            / F.size(toks).cast("double")
        ).alias("s_null"),
    )
    return scored.select(
        "y", F.lit("signal").alias("scorer"), F.col("s_signal").alias("s")
    ).unionAll(
        scored.select("y", F.lit("null").alias("scorer"), F.col("s_null").alias("s"))
    )


def _cum_by_score(long: DataFrame) -> DataFrame:
    """One row per distinct (scorer, s) with group counts and EXACT
    top-down cumulative counts, computed without any per-scorer
    single-task window: range-repartition on (scorer, s desc) with
    pinned assignment, within-partition cumsums, per-partition totals
    cumulated over <= partitions x scorers rows, broadcast back as
    offsets. Columns: scorer, n, tp, cum_n, cum_tp, n_pos, n_total."""
    by_score = long.groupBy("scorer", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("tp"),
    )
    # pin the range partitioning: offsets and local cumsums must see
    # the SAME assignment (re-executed lineage may resample bounds)
    parts = (
        by_score.repartitionByRange(32, F.col("scorer"), F.col("s").desc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = (
        Window.partitionBy("_pid", "scorer")
        .orderBy(F.desc("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.select(
        "scorer",
        "_pid",
        "n",
        "tp",
        F.sum("n").over(w_local).alias("_ln"),
        F.sum("tp").over(w_local).alias("_ltp"),
    )
    ptotals = parts.groupBy("scorer", "_pid").agg(
        F.sum("n").alias("_pn"), F.sum("tp").alias("_ptp")
    )
    w_off = Window.partitionBy("scorer").orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = ptotals.select(
        "scorer",
        "_pid",
        F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_offn"),
        F.coalesce(F.sum("_ptp").over(w_off), F.lit(0)).alias("_offtp"),
    )
    totals = parts.groupBy("scorer").agg(
        F.sum("tp").alias("n_pos"), F.sum("n").alias("n_total")
    )
    return (
        local.join(F.broadcast(offsets), ["scorer", "_pid"])
        .join(F.broadcast(totals), "scorer")
        .select(
            "scorer",
            "n",
            "tp",
            (F.col("_ln") + F.col("_offn")).alias("cum_n"),
            (F.col("_ltp") + F.col("_offtp")).alias("cum_tp"),
            "n_pos",
            "n_total",
        )
    )


@register(
    "agg_auc_roc",
    oracle=f"""
WITH scored AS (
    SELECT doc_id,
           CASE WHEN n_chars >= {AUC_LABEL_CHARS} THEN 1 ELSE 0 END AS y,
           CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS s_signal,
           len(list_filter(string_split(lower(text), ' '),
               t -> t IN ({_stops_sql()})))
               / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS s_null
    FROM documents
),
long AS (
    SELECT doc_id, y, 'signal' AS scorer, s_signal AS s FROM scored
    UNION ALL
    SELECT doc_id, y, 'null', s_null FROM scored
),
rk AS (
    SELECT scorer, y, s,
           CAST(ROW_NUMBER() OVER (PARTITION BY scorer ORDER BY s)
                AS DOUBLE) AS r
    FROM long
),
ranked AS (
    SELECT scorer, y,
           AVG(r) OVER (PARTITION BY scorer, s) AS midrank
    FROM rk
)
SELECT scorer,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       CAST(SUM(1 - y) AS BIGINT) AS n_neg,
       ROUND((SUM(CASE WHEN y = 1 THEN midrank ELSE 0 END)
              - SUM(y) * (SUM(y) + 1) / 2.0)
             / (SUM(y) * CAST(SUM(1 - y) AS DOUBLE)), 6) AS auc
FROM ranked
GROUP BY scorer
ORDER BY scorer
""",
    tags=("ml-eval", "classifier", "auc", "stats"),
)
def agg_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of two document scorers against the length label via the
    rank-sum identity with mid-rank ties — computed WITHOUT ranking
    rows: every tied group shares midrank n_total - cum_n + (n+1)/2,
    so R_pos is a sum of tp * midrank over the distinct-score table
    (the oracle states the per-row window form; the values are
    identical by the tie-group algebra).

    Scale shape: one combinable per-(scorer, score) aggregate, the
    shared distributed cumulative stage (no single-task window — see
    _cum_by_score), and a 2-row final reduce. The round-10 docstring
    called the per-scorer sort 'the price of an EXACT AUC'; the
    grouped identity shows there is no such price."""
    cum = _cum_by_score(_scored_long(spark, sf_dir))
    midrank = (
        F.col("n_total").cast("double")
        - F.col("cum_n")
        + (F.col("n") + F.lit(1)) / 2.0
    )
    return (
        cum.groupBy("scorer")
        .agg(
            F.max("n_pos").cast("bigint").alias("n_pos"),
            (F.max("n_total") - F.max("n_pos")).cast("bigint").alias("n_neg"),
            F.round(
                (
                    F.sum(F.col("tp") * midrank)
                    - F.max("n_pos") * (F.max("n_pos") + 1) / 2.0
                )
                / (
                    F.max("n_pos")
                    * (F.max("n_total") - F.max("n_pos")).cast("double")
                ),
                6,
            ).alias("auc"),
        )
        .orderBy("scorer")
    )


# --------------------------------------------------------------------
# agg_pr_auc — average precision (PR-AUC) from the same score pass
# --------------------------------------------------------------------


@register(
    "agg_pr_auc",
    oracle=f"""
WITH scored AS (
    SELECT doc_id,
           CASE WHEN n_chars >= {AUC_LABEL_CHARS} THEN 1 ELSE 0 END AS y,
           CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS s_signal,
           len(list_filter(string_split(lower(text), ' '),
               t -> t IN ({_stops_sql()})))
               / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS s_null
    FROM documents
),
long AS (
    SELECT y, 'signal' AS scorer, s_signal AS s FROM scored
    UNION ALL
    SELECT y, 'null', s_null FROM scored
),
by_score AS (
    SELECT scorer, s,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS tp
    FROM long GROUP BY scorer, s
),
cum AS (
    SELECT scorer, s, n, tp,
           SUM(n) OVER (PARTITION BY scorer ORDER BY s DESC) AS cum_n,
           SUM(tp) OVER (PARTITION BY scorer ORDER BY s DESC) AS cum_tp,
           SUM(tp) OVER (PARTITION BY scorer) AS n_pos
    FROM by_score
)
SELECT scorer,
       CAST(MAX(n_pos) AS BIGINT) AS n_pos,
       CAST(SUM(n) - MAX(n_pos) AS BIGINT) AS n_neg,
       ROUND(MAX(n_pos) / CAST(SUM(n) AS DOUBLE), 6) AS prevalence,
       ROUND(SUM((CAST(tp AS DOUBLE) / n_pos)
                 * (CAST(cum_tp AS DOUBLE) / cum_n)), 6) AS average_precision
FROM cum
GROUP BY scorer
ORDER BY scorer
""",
    tags=("ml-eval", "classifier", "pr-auc", "stats"),
)
def agg_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-wise PR-AUC, ties grouped at distinct
    thresholds: AP = sum over score groups of dR * precision-at-group)
    for the same two scorers agg_auc_roc evaluates — the metric that
    matters under the class imbalance quality filters actually face.
    Self-validates: AP_signal >> AP_null ~ prevalence.

    Scale shape: shares _cum_by_score's distributed cumulative stage
    with agg_auc_roc (no per-scorer single-task window even for
    continuous scorers); integer cumsums stay exact and the only
    doubles are the final per-group products, rounded at 6. The
    finish is a 2-row groupBy."""
    cum = _cum_by_score(_scored_long(spark, sf_dir))
    return (
        cum.groupBy("scorer")
        .agg(
            F.max("n_pos").cast("bigint").alias("n_pos"),
            (F.sum("n") - F.max("n_pos")).cast("bigint").alias("n_neg"),
            F.round(
                F.max("n_pos") / F.sum("n").cast("double"), 6
            ).alias("prevalence"),
            F.round(
                F.sum(
                    (F.col("tp").cast("double") / F.col("n_pos"))
                    * (F.col("cum_tp").cast("double") / F.col("cum_n"))
                ),
                6,
            ).alias("average_precision"),
        )
        .orderBy("scorer")
    )
