"""Benjamini-Hochberg false-discovery-rate control (SURVEY.md §2B
stats tier, round 9).

agg_holm_bonferroni controls the FAMILY-WISE error rate — the right
gate for a handful of launch guardrails. A metrics platform scoring
hundreds of segments wants FDR control instead: Benjamini & Hochberg
(JRSS-B 1995, public) tolerates a fixed fraction of false discoveries
in exchange for far more power. BH is a step-UP procedure — find the
LARGEST i with p_(i) <= (i/m)*alpha and reject everything stronger —
so where Holm's stop is a prefix MIN over pass flags, BH's is a
suffix MAX: the two procedures are window-dual, and both ladders are
compile-time plan literals (inverse normal CDF at import time).
"""

from __future__ import annotations

from statistics import NormalDist

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

BH_ALPHA = 0.10  # FDR budget (typical platform default)
BH_M = 5  # one z-test per event_type metric
# step i (1-based, strongest first) tests at (i/m) * alpha:
BH_Z_CRIT = tuple(
    round(NormalDist().inv_cdf(1 - (i / BH_M) * BH_ALPHA / 2), 6)
    for i in range(1, BH_M + 1)
)


def _crit_sql() -> str:
    return ", ".join(f"({i + 1}, {z})" for i, z in enumerate(BH_Z_CRIT))


@register(
    "agg_benjamini_hochberg",
    oracle=f"""
WITH arms AS (
    SELECT event_type,
           AVG(value) FILTER (WHERE user_id % 2 = 1) AS mt,
           VAR_SAMP(value) FILTER (WHERE user_id % 2 = 1) AS vt,
           COUNT(*) FILTER (WHERE user_id % 2 = 1) AS nt,
           AVG(value) FILTER (WHERE user_id % 2 = 0) AS mc,
           VAR_SAMP(value) FILTER (WHERE user_id % 2 = 0) AS vc,
           COUNT(*) FILTER (WHERE user_id % 2 = 0) AS nc
    FROM events GROUP BY event_type
),
z AS (
    SELECT event_type,
           ROUND((mt - mc) / sqrt(vt / nt + vc / nc), 6) AS z
    FROM arms
),
ranked AS (
    SELECT event_type, z,
           CAST(ROW_NUMBER() OVER (ORDER BY ABS(z) DESC, event_type)
                AS BIGINT) AS bh_step
    FROM z
),
crit(bh_step, z_crit) AS (VALUES {_crit_sql()}),
flags AS (
    SELECT r.event_type, r.z, r.bh_step, c.z_crit,
           CASE WHEN ABS(r.z) >= c.z_crit THEN 1 ELSE 0 END AS pass
    FROM ranked r JOIN crit c USING (bh_step)
)
SELECT event_type, z, bh_step, z_crit,
       MAX(pass) OVER (ORDER BY bh_step
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           = 1 AS bh_reject
FROM flags
ORDER BY bh_step
""",
    tags=("stats", "experimentation", "multiplicity", "fdr"),
)
def agg_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH step-up FDR over the same {BH_M} per-metric Welch z-tests as
    agg_holm_bonferroni: metrics sort by |z|, step i compares against
    the precomputed (i/m)*alpha ladder, and the step-up rule — reject
    everything at or above the LARGEST passing step — is a suffix MAX
    over the pass flags (Holm's prefix-MIN window mirrored).

    Scale shape: identical to the Holm query — ONE combinable groupBy
    of both arms' sufficient statistics, then ranking, a VALUES-
    literal threshold join, and one window over exactly m = {BH_M}
    rows (the declared aggregate-bounded unpartitioned-window
    class)."""
    ev = load_table(spark, sf_dir, "events")
    treat = F.col("user_id") % 2 == 1
    arms = ev.groupBy("event_type").agg(
        F.avg(F.when(treat, F.col("value"))).alias("mt"),
        F.var_samp(F.when(treat, F.col("value"))).alias("vt"),
        F.count(F.when(treat, F.lit(1))).alias("nt"),
        F.avg(F.when(~treat, F.col("value"))).alias("mc"),
        F.var_samp(F.when(~treat, F.col("value"))).alias("vc"),
        F.count(F.when(~treat, F.lit(1))).alias("nc"),
    )
    z = arms.select(
        "event_type",
        F.round(
            (F.col("mt") - F.col("mc"))
            / F.sqrt(F.col("vt") / F.col("nt") + F.col("vc") / F.col("nc")),
            6,
        ).alias("z"),
    )
    ranked = z.withColumn(
        "bh_step",
        F.row_number()
        .over(Window.orderBy(F.desc(F.abs(F.col("z"))), "event_type"))
        .cast("bigint"),
    )
    # VALUES literal (LocalRelation) rather than createDataFrame
    # (opaque LogicalRDD) so the bounded-window plan assertion can
    # prove the ladder's boundedness structurally (tests/test_plans.py).
    crit = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(
            f"(CAST({i + 1} AS BIGINT), CAST({zc!r} AS DOUBLE))"
            for i, zc in enumerate(BH_Z_CRIT)
        )
        + " AS crit(bh_step, z_crit)"
    )
    flags = ranked.join(F.broadcast(crit), "bh_step").select(
        "event_type",
        "z",
        "bh_step",
        "z_crit",
        F.when(F.abs(F.col("z")) >= F.col("z_crit"), 1).otherwise(0).alias(
            "pass"
        ),
    )
    w_suffix = Window.orderBy("bh_step").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return flags.select(
        "event_type",
        "z",
        "bh_step",
        "z_crit",
        (F.max("pass").over(w_suffix) == 1).alias("bh_reject"),
    ).orderBy("bh_step")
