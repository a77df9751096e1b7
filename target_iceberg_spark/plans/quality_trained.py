"""Trained logistic quality classifier via unrolled IRLS (SURVEY.md
§2B curation tier, round 11).

text_quality_logistic (plans/analytics_more.py) applies a FIXED-weight
scorer — the missing half of a fastText/CCNet-style quality pipeline
(Joulin et al. 2016; Wenzek et al. 2019, both public) is the FIT. This
query trains the coefficients distributed: two unrolled
iteratively-reweighted-least-squares (Newton) steps for logistic
regression (Green 1984; Hastie/Tibshirani/Friedman ESL §4.4.1, public),
the supervised twin of agg_gmm_em's unrolled EM
(plans/stats_gmm.py:94).

Design:
  - 3 coefficients (intercept, ln token count, repetition ratio) so
    the Newton step's 3x3 Hessian inverts in CLOSED FORM (adjugate /
    determinant) — exact IRLS, no matrix library, pure scalar algebra
    both engines can run identically.
  - Planted labels: y = 1 when the doc's repetition ratio is at most
    REP_CUT ("clean"), with a deterministic 1/16 md5 label flip so the
    problem is noisy rather than perfectly separable.
  - Per-iteration rounding discipline (registry convention): the
    per-row sigmoid rounds to 6 before weighting, every H/g aggregate
    entry rounds to 6 before the solve, and beta rounds to 6 before the
    next iteration — both engines present identical doubles to every
    step, so the fit matches bit-for-bit after ROUND.

Scale shape: features are in-row codegen over the split-once token
array (no explode); each IRLS step is ONE broadcast of a 1-row beta
table + ONE map-side-combinable aggregate of 9 moment sums — no
shuffle grows with the corpus, exactly the GMM/kmeans iteration shape.
The final accuracy pass is one more broadcast + combinable aggregate.
Self-validation: the trained fit must beat the majority-class rate on
its own training labels (`trained_beats_majority`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

IRLS_ITERS = 2  # unrolled Newton steps (each = 1 broadcast + 1 agg)
REP_CUT = 0.54  # planted label: clean docs have rep_ratio <= this
FLIP_HEX = "0"  # md5 first hex digit -> deterministic 1/16 label noise


def _solve_sql(b: str, h: str) -> str:
    """Closed-form 3x3 Newton update: beta_new = beta + H^-1 g with H
    symmetric, via the adjugate — emitted once per iteration with CTE
    prefixes ``b`` (current beta) and ``h`` (rounded moment table)."""
    det = (
        f"({h}.h00 * ({h}.h11 * {h}.h22 - {h}.h12 * {h}.h12)"
        f" - {h}.h01 * ({h}.h01 * {h}.h22 - {h}.h12 * {h}.h02)"
        f" + {h}.h02 * ({h}.h01 * {h}.h12 - {h}.h11 * {h}.h02))"
    )
    d0 = (
        f"(({h}.h11 * {h}.h22 - {h}.h12 * {h}.h12) * {h}.g0"
        f" + ({h}.h02 * {h}.h12 - {h}.h01 * {h}.h22) * {h}.g1"
        f" + ({h}.h01 * {h}.h12 - {h}.h02 * {h}.h11) * {h}.g2)"
    )
    d1 = (
        f"(({h}.h02 * {h}.h12 - {h}.h01 * {h}.h22) * {h}.g0"
        f" + ({h}.h00 * {h}.h22 - {h}.h02 * {h}.h02) * {h}.g1"
        f" + ({h}.h01 * {h}.h02 - {h}.h00 * {h}.h12) * {h}.g2)"
    )
    d2 = (
        f"(({h}.h01 * {h}.h12 - {h}.h02 * {h}.h11) * {h}.g0"
        f" + ({h}.h01 * {h}.h02 - {h}.h00 * {h}.h12) * {h}.g1"
        f" + ({h}.h00 * {h}.h11 - {h}.h01 * {h}.h01) * {h}.g2)"
    )
    return (
        f"SELECT ROUND({b}.b0 + {d0} / {det}, 6) AS b0,"
        f"       ROUND({b}.b1 + {d1} / {det}, 6) AS b1,"
        f"       ROUND({b}.b2 + {d2} / {det}, 6) AS b2"
        f" FROM {b} CROSS JOIN {h}"
    )


def _moments_sql(beta: str) -> str:
    # p rounds to 6 BEFORE weighting; every aggregate rounds to 6
    # before the solve (identical discipline in the Spark builder).
    return f"""
    SELECT ROUND(SUM(y - p), 6)            AS g0,
           ROUND(SUM(x1 * (y - p)), 6)     AS g1,
           ROUND(SUM(x2 * (y - p)), 6)     AS g2,
           ROUND(SUM(p * (1 - p)), 6)      AS h00,
           ROUND(SUM(x1 * p * (1 - p)), 6) AS h01,
           ROUND(SUM(x2 * p * (1 - p)), 6) AS h02,
           ROUND(SUM(x1 * x1 * p * (1 - p)), 6) AS h11,
           ROUND(SUM(x1 * x2 * p * (1 - p)), 6) AS h12,
           ROUND(SUM(x2 * x2 * p * (1 - p)), 6) AS h22
    FROM (SELECT y, x1, x2,
                 ROUND(1.0 / (1.0 + EXP(-({beta}.b0 + {beta}.b1 * x1
                                          + {beta}.b2 * x2))), 6) AS p
          FROM feats CROSS JOIN {beta})
"""


_ORACLE = f"""
WITH feats AS (
    SELECT LN(len(string_split(text, ' '))) AS x1,
           1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS x2,
           CASE WHEN (1.0 - CAST(len(list_distinct(string_split(text, ' ')))
                               AS DOUBLE)
                          / len(string_split(text, ' ')) <= {REP_CUT})
                     != (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         = '{FLIP_HEX}')
                THEN 1.0 ELSE 0.0 END AS y
    FROM documents
),
beta0 AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1,
                 CAST(0 AS DOUBLE) AS b2),
m1 AS ({_moments_sql("beta0")}),
beta1 AS ({_solve_sql("beta0", "m1")}),
m2 AS ({_moments_sql("beta1")}),
beta2 AS ({_solve_sql("beta1", "m2")}),
scored AS (
    SELECT y,
           ROUND(1.0 / (1.0 + EXP(-(b.b0 + b.b1 * x1 + b.b2 * x2))), 6) AS p
    FROM feats CROSS JOIN beta2 b
),
acc AS (
    SELECT ROUND(AVG(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1.0
                          ELSE 0.0 END), 6) AS accuracy,
           ROUND(GREATEST(AVG(y), 1 - AVG(y)), 6) AS majority_rate
    FROM scored
)
SELECT b.b0 AS beta_intercept, b.b1 AS beta_ln_tokens, b.b2 AS beta_rep,
       a.accuracy, a.majority_rate,
       a.accuracy > a.majority_rate AS trained_beats_majority,
       b.b2 < 0 AS rep_weight_negative
FROM beta2 b CROSS JOIN acc a
"""


@register(
    "text_quality_trained",
    oracle=_ORACLE,
    tags=("text", "quality", "curation", "ml", "irls"),
)
def text_quality_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{IRLS_ITERS} unrolled IRLS/Newton steps training a logistic
    quality classifier (intercept, ln token count, repetition ratio)
    on planted noisy labels (clean = rep_ratio <= {REP_CUT}, md5 1/16
    flip): per-row sigmoid against broadcast beta, one combinable
    9-moment aggregate per step, closed-form 3x3 Hessian solve, then a
    final accuracy pass. Fit must beat the majority class and assign
    repetition a negative weight — the supervised twin of agg_gmm_em.

    Scale shape: zero corpus-sized shuffles — every step is broadcast
    1-row params + map-side-combinable aggregate; features never leave
    the row they were computed in."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    rep = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_tok
    clean = rep <= REP_CUT
    flip = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == FLIP_HEX
    # localCheckpoint: the feature frame is consumed by every IRLS
    # moment aggregate AND the final scoring pass — without it the
    # tokenize + array_distinct feature extraction re-executes once
    # per consumer through the compounding beta lineage (guide §2.4;
    # 3 doubles per doc materialized, the production feature table).
    feats = docs.select(
        F.log(n_tok.cast("double")).alias("x1"),
        rep.alias("x2"),
        F.when(clean != flip, F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    ).localCheckpoint()

    beta = spark.sql(
        "SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1,"
        " CAST(0 AS DOUBLE) AS b2"
    )
    for _ in range(IRLS_ITERS):
        p = F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.col("b0")
                        + F.col("b1") * F.col("x1")
                        + F.col("b2") * F.col("x2")
                    )
                )
            ),
            6,
        )
        rows = feats.crossJoin(F.broadcast(beta)).select(
            "y", "x1", "x2", p.alias("p")
        )
        w = F.col("p") * (1 - F.col("p"))
        r = F.col("y") - F.col("p")
        m = rows.agg(
            F.round(F.sum(r), 6).alias("g0"),
            F.round(F.sum(F.col("x1") * r), 6).alias("g1"),
            F.round(F.sum(F.col("x2") * r), 6).alias("g2"),
            F.round(F.sum(w), 6).alias("h00"),
            F.round(F.sum(F.col("x1") * w), 6).alias("h01"),
            F.round(F.sum(F.col("x2") * w), 6).alias("h02"),
            F.round(F.sum(F.col("x1") * F.col("x1") * w), 6).alias("h11"),
            F.round(F.sum(F.col("x1") * F.col("x2") * w), 6).alias("h12"),
            F.round(F.sum(F.col("x2") * F.col("x2") * w), 6).alias("h22"),
        )
        h00, h01, h02 = F.col("h00"), F.col("h01"), F.col("h02")
        h11, h12, h22 = F.col("h11"), F.col("h12"), F.col("h22")
        g0, g1, g2 = F.col("g0"), F.col("g1"), F.col("g2")
        det = (
            h00 * (h11 * h22 - h12 * h12)
            - h01 * (h01 * h22 - h12 * h02)
            + h02 * (h01 * h12 - h11 * h02)
        )
        d0 = (
            (h11 * h22 - h12 * h12) * g0
            + (h02 * h12 - h01 * h22) * g1
            + (h01 * h12 - h02 * h11) * g2
        )
        d1 = (
            (h02 * h12 - h01 * h22) * g0
            + (h00 * h22 - h02 * h02) * g1
            + (h01 * h02 - h00 * h12) * g2
        )
        d2 = (
            (h01 * h12 - h02 * h11) * g0
            + (h01 * h02 - h00 * h12) * g1
            + (h00 * h11 - h01 * h01) * g2
        )
        beta = beta.crossJoin(F.broadcast(m)).select(
            F.round(F.col("b0") + d0 / det, 6).alias("b0"),
            F.round(F.col("b1") + d1 / det, 6).alias("b1"),
            F.round(F.col("b2") + d2 / det, 6).alias("b2"),
        )

    scored = feats.crossJoin(F.broadcast(beta)).select(
        "y",
        F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.col("b0")
                        + F.col("b1") * F.col("x1")
                        + F.col("b2") * F.col("x2")
                    )
                )
            ),
            6,
        ).alias("p"),
    )
    acc = scored.agg(
        F.round(
            F.avg(
                F.when(
                    (F.col("p") >= 0.5) == (F.col("y") == 1.0), F.lit(1.0)
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("accuracy"),
        F.round(F.greatest(F.avg("y"), 1 - F.avg("y")), 6).alias(
            "majority_rate"
        ),
    )
    return beta.crossJoin(F.broadcast(acc)).select(
        F.col("b0").alias("beta_intercept"),
        F.col("b1").alias("beta_ln_tokens"),
        F.col("b2").alias("beta_rep"),
        "accuracy",
        "majority_rate",
        (F.col("accuracy") > F.col("majority_rate")).alias(
            "trained_beats_majority"
        ),
        (F.col("b2") < 0).alias("rep_weight_negative"),
    )
