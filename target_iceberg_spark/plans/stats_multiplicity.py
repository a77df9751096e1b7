"""Holm-Bonferroni multiple-testing correction over a metric family
(SURVEY.md §2B stats tier, round 9).

An experiment readout is never one test: every guardrail metric gets
its own z-test and the 5% false-positive budget must be SHARED. Holm's
step-down procedure (Scand. J. Statist. 1979, public) sorts the
statistics by evidence and tests the i-th strongest at alpha/(m-i+1),
stopping at the first failure — uniformly more powerful than plain
Bonferroni, zero distributional extras. p-values need an inverse
normal CDF neither engine exposes, so the step thresholds are
compile-time plan literals (Python's statistics.NormalDist at import
time) and both arms compare |z| against the SAME literal ladder.
"""

from __future__ import annotations

from statistics import NormalDist

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

HOLM_ALPHA = 0.05
HOLM_M = 5  # one z-test per event_type metric
# step i (1-based, strongest first) tests at alpha / (m - i + 1):
HOLM_Z_CRIT = tuple(
    round(NormalDist().inv_cdf(1 - HOLM_ALPHA / (2 * (HOLM_M - i + 1))), 6)
    for i in range(1, HOLM_M + 1)
)


def _crit_values_sql() -> str:
    return ", ".join(
        f"({i + 1}, {z})" for i, z in enumerate(HOLM_Z_CRIT)
    )


@register(
    "agg_holm_bonferroni",
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
                AS BIGINT) AS holm_step
    FROM z
),
crit(holm_step, z_crit) AS (VALUES {_crit_values_sql()}),
flags AS (
    SELECT r.event_type, r.z, r.holm_step, c.z_crit,
           CASE WHEN ABS(r.z) >= c.z_crit THEN 1 ELSE 0 END AS pass
    FROM ranked r JOIN crit c USING (holm_step)
)
SELECT event_type, z, holm_step, z_crit,
       MIN(pass) OVER (ORDER BY holm_step
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           = 1 AS holm_reject
FROM flags
ORDER BY holm_step
""",
    tags=("stats", "experimentation", "multiplicity"),
)
def agg_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down over {HOLM_M} per-metric Welch z-tests (mean
    `value` per event_type, treatment = odd user_ids): metrics sort by
    |z|, step i compares against the precomputed z ladder for
    alpha/(m-i+1), and the step-down stop is a cumulative MIN over the
    pass flags (a later metric cannot be rejected once an earlier one
    fails).

    Scale shape: the only event-volume stage is ONE combinable groupBy
    computing both arms' sufficient statistics via conditional
    aggregates (no second scan per arm); everything after — ranking,
    the threshold join (a VALUES literal), the cumulative min — runs
    over exactly m = {HOLM_M} rows. The unpartitioned windows are in
    the declared aggregate-bounded class."""
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
    w_rank = Window.orderBy(F.desc(F.abs(F.col("z"))), "event_type")
    ranked = z.withColumn(
        "holm_step", F.row_number().over(w_rank).cast("bigint")
    )
    # VALUES literal (plans as a LocalRelation) rather than
    # createDataFrame (plans as an opaque LogicalRDD): the ladder's
    # boundedness is then structurally provable by the registry-wide
    # bounded-window plan assertion (tests/test_plans.py).
    crit = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(
            f"(CAST({i + 1} AS BIGINT), CAST({zc!r} AS DOUBLE))"
            for i, zc in enumerate(HOLM_Z_CRIT)
        )
        + " AS crit(holm_step, z_crit)"
    )
    flags = ranked.join(F.broadcast(crit), "holm_step").select(
        "event_type",
        "z",
        "holm_step",
        "z_crit",
        F.when(F.abs(F.col("z")) >= F.col("z_crit"), 1).otherwise(0).alias(
            "pass"
        ),
    )
    w_cum = Window.orderBy("holm_step").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flags.select(
        "event_type",
        "z",
        "holm_step",
        "z_crit",
        (F.min("pass").over(w_cum) == 1).alias("holm_reject"),
    ).orderBy("holm_step")
