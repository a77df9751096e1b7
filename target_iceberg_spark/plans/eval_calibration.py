"""Expected Calibration Error (SURVEY.md §2B ML-evaluation tier,
round 10).

AUC measures RANKING quality; a filtering pipeline that thresholds
"probability this document is high-quality" also needs the
probabilities to MEAN something. ECE (Naeini et al. AAAI 2015;
Guo et al. ICML 2017, public) is the standard check: bin predictions
by confidence, compare each bin's mean confidence against its
empirical accuracy, weight by bin mass:

    ECE = sum_b (n_b / N) * |acc_b - conf_b|

The model under test is a fixed logistic link on the standardized
token count against the length label — deterministic, monotone, and
deliberately imperfect (tokens track chars tightly but not exactly),
so the reliability diagram has real off-diagonal mass to measure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ECE_LABEL_CHARS = 200  # positive class: n_chars >= this
ECE_BINS = 10  # equal-width confidence bins on [0, 1]


@register(
    "agg_calibration_ece",
    oracle=f"""
WITH stats AS (
    SELECT AVG(len(string_split(lower(text), ' '))) AS mu,
           STDDEV_SAMP(len(string_split(lower(text), ' '))) AS sd
    FROM documents
),
pred AS (
    SELECT CASE WHEN d.n_chars >= {ECE_LABEL_CHARS} THEN 1 ELSE 0 END AS y,
           ROUND(1 / (1 + EXP(-((len(string_split(lower(d.text), ' ')) - s.mu)
                                / s.sd))), 6) AS p
    FROM documents d CROSS JOIN stats s
),
binned AS (
    SELECT LEAST(CAST(FLOOR(p * {ECE_BINS}) AS BIGINT), {ECE_BINS} - 1) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_b,
           AVG(CAST(y AS DOUBLE)) AS acc,
           AVG(p) AS conf
    FROM pred GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_b) AS DOUBLE) AS n FROM binned)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins_hit,
       CAST(MAX(t.n) AS BIGINT) AS n_docs,
       ROUND(SUM(b.n_b / t.n * ABS(b.acc - b.conf)), 6) AS ece,
       ROUND(MAX(ABS(b.acc - b.conf)), 6) AS max_bin_gap
FROM binned b CROSS JOIN tot t
""",
    tags=("ml-eval", "calibration", "classifier"),
)
def agg_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECE of the standardized-token-count logistic scorer against the
    length label: probabilities round to 6 (cross-engine exp ulps die
    before binning), {ECE_BINS} equal-width bins, mass-weighted mean
    |accuracy - confidence| plus the worst single-bin gap (the MCE).

    Scale shape: pass one is a one-row moment aggregate (mu, sd);
    pass two computes p map-side against that broadcast row and
    reduces straight to <= {ECE_BINS} bins — combinable all the way,
    no window, no join wider than one row. The reliability diagram at
    100 TB costs two scans and shuffles {ECE_BINS} rows."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.lower(F.col("text")), " "))
    stats = docs.agg(
        F.avg(ntok).alias("mu"), F.stddev_samp(ntok).alias("sd")
    )
    pred = docs.crossJoin(F.broadcast(stats)).select(
        F.when(F.col("n_chars") >= ECE_LABEL_CHARS, 1).otherwise(0).alias("y"),
        F.round(
            1 / (1 + F.exp(-((ntok - F.col("mu")) / F.col("sd")))), 6
        ).alias("p"),
    )
    binned = pred.groupBy(
        F.least(
            F.floor(F.col("p") * ECE_BINS).cast("bigint"), F.lit(ECE_BINS - 1).cast("bigint")
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.avg(F.col("y").cast("double")).alias("acc"),
        F.avg("p").alias("conf"),
    )
    tot = binned.agg(F.sum("n_b").cast("double").alias("n"))
    return binned.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins_hit"),
        F.max("n").cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.col("n_b") / F.col("n") * F.abs(F.col("acc") - F.col("conf"))), 6
        ).alias("ece"),
        F.round(F.max(F.abs(F.col("acc") - F.col("conf"))), 6).alias("max_bin_gap"),
    )
