"""Differentially-private release mechanism — Laplace counts
(SURVEY.md §2B curation/privacy tier, round 10).

The privacy tier has suppression (curation_k_anonymity) and scrubbing
(curation_pii_redact); the third leg of a data-release pipeline is
NOISE: publish per-group counts with Laplace noise calibrated to
sensitivity/epsilon (Dwork et al. TCC 2006, public) instead of exact
values. The mechanism is one map-side expression over the group
aggregate — the inverse-CDF Laplace transform of a uniform draw.

DETERMINISM CAVEAT, stated honestly: the uniform here is md5-derived
from the group key so both engines produce identical noise and the
driver hash can check the MECHANISM'S algebra end-to-end. That makes
this a calibration/test harness, NOT a private release — deterministic
noise is recomputable and provides zero privacy. A deployment swaps
the md5 uniform for a real entropy source and deletes the exact
column; every other line stays.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

DP_EPSILON = 1.0  # privacy budget; sensitivity of a count = 1
DP_B = 1.0 / DP_EPSILON  # Laplace scale
# 95% Laplace interval: |noise| <= b * ln(1/0.05)
DP_BOUND = round(DP_B * 2.995732, 6)


@register(
    "curation_dp_counts",
    oracle=f"""
WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_n
    FROM documents GROUP BY source
),
noised AS (
    SELECT source, exact_n,
           (('0x' || substr(md5(source || ':dp'), 1, 8))::BIGINT + 0.5)
               / 4294967296.0 AS u
    FROM counts
),
mech AS (
    SELECT source, exact_n,
           ROUND(CASE WHEN u < 0.5
                      THEN {DP_B} * LN(2 * u)
                      ELSE -{DP_B} * LN(2 * (1 - u)) END, 6) AS noise
    FROM noised
)
SELECT source, exact_n,
       ROUND(exact_n + noise, 6) AS dp_n,
       ABS(noise) <= {DP_BOUND} AS within_95_interval
FROM mech
ORDER BY source
""",
    tags=("curation", "privacy", "dp", "mechanism"),
)
def curation_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace mechanism over per-source doc counts at epsilon
    {DP_EPSILON}: inverse-CDF noise from an md5-uniform (deterministic
    so the driver hash pins the mechanism algebra — see module
    docstring for why that is a test harness, not a private release),
    noisy count published beside the exact count and the 95%-interval
    contract |noise| <= b*ln(20).

    Scale shape: the count is ONE combinable groupBy; the mechanism is
    a per-GROUP map expression (cost independent of corpus size — the
    whole point of output perturbation over input perturbation). The
    ln rounds to 6 before the addition on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n")
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col("source"), F.lit(":dp"))), 1, 8), 16, 10).cast(
            "bigint"
        )
        + 0.5
    ) / F.lit(4294967296.0)
    noised = counts.select("source", "exact_n", u.alias("u"))
    noise = F.round(
        F.when(F.col("u") < 0.5, F.lit(DP_B) * F.log(2 * F.col("u"))).otherwise(
            -F.lit(DP_B) * F.log(2 * (1 - F.col("u")))
        ),
        6,
    )
    return (
        noised.select("source", "exact_n", noise.alias("noise"))
        .select(
            "source",
            "exact_n",
            F.round(F.col("exact_n") + F.col("noise"), 6).alias("dp_n"),
            (F.abs(F.col("noise")) <= DP_BOUND).alias("within_95_interval"),
        )
        .orderBy("source")
    )
