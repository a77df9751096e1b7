"""Histogram selectivity-estimator audit (SURVEY.md §2B profiling
tier, round 9).

Cost-based optimizers estimate predicate selectivity from column
histograms under a uniform-within-bucket assumption (Selinger et al.
SIGMOD'79; Ioannidis VLDB'03 survey — public). Auditing that estimate
against the TRUE selectivity on real predicates is how an engine team
decides whether its ANALYZE statistics are good enough or a skewed
column needs more buckets — this query is that audit, run as a plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SEL_BUCKETS = 16
SEL_THRESHOLDS = (25_000.0, 100_000.0, 250_000.0, 400_000.0)


def _sel_oracle() -> str:
    th = ", ".join(f"({t})" for t in SEL_THRESHOLDS)
    return f"""
WITH mm AS (
    SELECT MIN(o_totalprice) AS lo,
           (MAX(o_totalprice) - MIN(o_totalprice)) / {SEL_BUCKETS} AS w
    FROM orders
),
hist AS (
    SELECT LEAST(CAST(FLOOR((o_totalprice - mm.lo) / mm.w) AS BIGINT),
                 {SEL_BUCKETS - 1}) AS bucket,
           COUNT(*) AS c
    FROM orders, mm
    GROUP BY 1
),
th(threshold) AS (VALUES {th}),
est AS (
    SELECT t.threshold,
           SUM(CASE
               WHEN mm.lo + (h.bucket + 1) * mm.w <= t.threshold THEN h.c
               WHEN mm.lo + h.bucket * mm.w < t.threshold
               THEN h.c * (t.threshold - (mm.lo + h.bucket * mm.w)) / mm.w
               ELSE 0 END) AS est_rows
    FROM th t, hist h, mm
    GROUP BY t.threshold
),
act AS (
    SELECT t.threshold,
           CAST(COUNT(*) FILTER (WHERE o.o_totalprice < t.threshold)
                AS BIGINT) AS actual_rows
    FROM th t, orders o
    GROUP BY t.threshold
)
SELECT e.threshold,
       ROUND(e.est_rows, 4) AS est_rows,
       a.actual_rows,
       ROUND(ABS(e.est_rows - a.actual_rows)
             / GREATEST(a.actual_rows, 1), 6) AS rel_error
FROM est e JOIN act a USING (threshold)
ORDER BY threshold
"""


@register(
    "profile_selectivity_audit",
    oracle=_sel_oracle(),
    tags=("profiling", "optimizer", "histogram"),
)
def profile_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each audit predicate o_totalprice < T: the row count a
    {SEL_BUCKETS}-bucket equi-width histogram PREDICTS under the
    uniform-within-bucket assumption (full buckets below T plus the
    fractional share of the straddling bucket) next to the TRUE
    count, with the relative error — the optimizer-statistics health
    check.

    Scale shape: the histogram is one combinable groupBy over bucket
    ids derived from a broadcast one-row min/width frame; estimates
    fold {SEL_BUCKETS} x |thresholds| rows; true counts are
    conditional aggregates over one threshold-fanned scan whose
    partial aggregation collapses map-side. Both engines compute the
    bucket id with the IDENTICAL double expression, so edge values
    bucket identically."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    # localCheckpoint: the 1-row min/width frame is broadcast into both
    # the histogram build and the estimate fold — each consumer re-ran
    # the full-column min/max aggregate without the cut.
    mm = orders.agg(
        F.min("o_totalprice").alias("lo"),
        (
            (F.max("o_totalprice") - F.min("o_totalprice")) / SEL_BUCKETS
        ).alias("w"),
    ).localCheckpoint()
    hist = (
        orders.crossJoin(F.broadcast(mm))
        .groupBy(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / F.col("w"))
                .cast("bigint"),
                F.lit(SEL_BUCKETS - 1),
            ).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    th = spark.createDataFrame(
        [(t,) for t in SEL_THRESHOLDS], "threshold DOUBLE"
    )
    lo_b = F.col("lo") + F.col("bucket") * F.col("w")
    hi_b = F.col("lo") + (F.col("bucket") + 1) * F.col("w")
    est = (
        th.crossJoin(hist)
        .crossJoin(F.broadcast(mm))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(hi_b <= F.col("threshold"), F.col("c"))
                .when(
                    lo_b < F.col("threshold"),
                    F.col("c") * (F.col("threshold") - lo_b) / F.col("w"),
                )
                .otherwise(F.lit(0))
            ).alias("est_rows")
        )
    )
    act = (
        orders.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("o_totalprice") < F.col("threshold"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("actual_rows")
        )
    )
    return (
        est.join(act, "threshold")
        .select(
            "threshold",
            F.round("est_rows", 4).alias("est_rows"),
            "actual_rows",
            F.round(
                F.abs(F.col("est_rows") - F.col("actual_rows"))
                / F.greatest(F.col("actual_rows"), F.lit(1)),
                6,
            ).alias("rel_error"),
        )
        .orderBy("threshold")
    )
