"""Pearson chi-squared independence test + Brown-Forsythe variance
homogeneity (SURVEY.md §2B stats tier, round 10).

Two workhorse categorical/variance diagnostics the experimentation
tier still lacked:

- `agg_chi2_independence` — Pearson (1900, public) chi-squared test of
  independence between event_type and a high/low value split: is the
  conversion-value mix the same across event categories? The platform
  analogue is the guardrail "did the category mix shift under the
  treatment?".
- `agg_levene_bf` — Brown & Forsythe (JASA 1974, public): Levene's
  variance-equality test with the MEDIAN as the per-group center,
  robust to the heavy right tail the events fixture has. The t-test
  family upstream assumes variance homogeneity; this is the check.

Both are single-pass sufficient-statistic plans: one combinable
groupBy, a broadcast of the (tiny) totals, closed-form statistic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# High/low split point for the contingency column (fixture median ~35).
CHI2_SPLIT = 35.0

# chi-squared 0.95 quantiles for dof 1..8 (Abramowitz & Stegun table
# 26.8, public) — the plan joins its computed dof against this ladder
# so the reject decision is engine-portable without an inv-cdf.
CHI2_CRIT_95 = (
    (1, 3.841459),
    (2, 5.991465),
    (3, 7.814728),
    (4, 9.487729),
    (5, 11.070498),
    (6, 12.591587),
    (7, 14.067140),
    (8, 15.507313),
)


def _crit_values_sql() -> str:
    return ", ".join(f"({d}, {c})" for d, c in CHI2_CRIT_95)


@register(
    "agg_chi2_independence",
    oracle=f"""
WITH cells AS (
    SELECT event_type,
           CASE WHEN value >= {CHI2_SPLIT} THEN 1 ELSE 0 END AS value_hi,
           CAST(COUNT(*) AS BIGINT) AS o
    FROM events GROUP BY 1, 2
),
tot AS (
    SELECT event_type, value_hi, o,
           SUM(o) OVER (PARTITION BY event_type) AS row_tot,
           SUM(o) OVER (PARTITION BY value_hi) AS col_tot,
           SUM(o) OVER () AS n
    FROM cells
),
stat AS (
    SELECT ROUND(SUM(POW(o - row_tot * col_tot / CAST(n AS DOUBLE), 2)
                     / (row_tot * col_tot / CAST(n AS DOUBLE))), 6) AS chi2,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT value_hi) - 1) AS BIGINT) AS dof,
           CAST(MAX(n) AS BIGINT) AS n
    FROM tot
),
crit(dof, chi2_crit) AS (VALUES {_crit_values_sql()})
SELECT s.chi2, s.dof, s.n, c.chi2_crit,
       s.chi2 >= c.chi2_crit AS reject_independence
FROM stat s JOIN crit c USING (dof)
""",
    tags=("stats", "experimentation", "contingency"),
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence test over the event_type x
    (value >= split) contingency table: observed cell counts, expected
    counts from the margin products, X^2 = sum (O-E)^2/E, dof =
    (r-1)(c-1), reject vs the import-time 0.95 critical ladder.

    Scale shape: the contingency table is ONE combinable groupBy on
    (event_type, value_hi) — r x 2 rows regardless of data size; the
    margins are windows over that tiny table, the critical-value join
    is a broadcast VALUES literal. The only full-data pass is the
    map-side-combinable count."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.when(F.col("value") >= CHI2_SPLIT, F.lit(1)).otherwise(F.lit(0)).alias("value_hi"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    from pyspark.sql import Window

    tot = cells.select(
        "event_type",
        "value_hi",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("value_hi")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n").cast("double")
    stat = tot.agg(
        F.round(F.sum(F.pow(F.col("o") - e, F.lit(2)) / e), 6).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("value_hi") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.max("n").cast("bigint").alias("n"),
    )
    crit = spark.createDataFrame(list(CHI2_CRIT_95), "dof BIGINT, chi2_crit DOUBLE")
    return stat.join(F.broadcast(crit), "dof").select(
        "chi2",
        "dof",
        "n",
        "chi2_crit",
        (F.col("chi2") >= F.col("chi2_crit")).alias("reject_independence"),
    )


@register(
    "agg_levene_bf",
    oracle="""
WITH med AS (
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS med
    FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_type, ABS(e.value - m.med) AS z
    FROM events e JOIN med m USING (event_type)
),
grp AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_j,
           AVG(z) AS zbar_j,
           VAR_SAMP(z) AS zvar_j
    FROM dev GROUP BY event_type
),
tot AS (
    SELECT CAST(SUM(n_j) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS k,
           SUM(n_j * zbar_j) / SUM(n_j) AS zbar,
           SUM((n_j - 1) * zvar_j) AS ssw
    FROM grp
)
SELECT ROUND((SUM(g.n_j * POW(g.zbar_j - t.zbar, 2)) / (t.k - 1))
             / (t.ssw / (t.n - t.k)), 6) AS f_stat,
       CAST(t.k - 1 AS BIGINT) AS dof_between,
       CAST(t.n - t.k AS BIGINT) AS dof_within
FROM grp g CROSS JOIN tot t
GROUP BY t.k, t.n, t.ssw, t.zbar
""",
    tags=("stats", "experimentation", "variance"),
)
def agg_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test: one-way ANOVA F over z_ij = |x_ij - med_j|
    (median-centered Levene, robust to the fixture's right skew).
    F = [SSB/(k-1)] / [SSW/(N-k)] from per-group sufficient stats.

    Scale shape: two combinable groupBys over events (one exact
    per-group percentile — a sort-based aggregate within each of k
    bounded groups — one moment pass on the deviations), then
    closed-form algebra on the k-row table with the grand totals
    broadcast via cross join of a 1-row aggregate. The per-group
    median rounds to 6 before differencing on both engines so
    interpolation ulps cannot leak into z."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    grp = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.avg("z").alias("zbar_j"),
        F.var_samp("z").alias("zvar_j"),
    )
    tot = grp.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.sum(F.col("n_j") * F.col("zbar_j")) / F.sum("n_j")).alias("zbar"),
        F.sum((F.col("n_j") - 1) * F.col("zvar_j")).alias("ssw"),
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("k", "n", "ssw", "zbar")
        .agg(
            F.round(
                (F.sum(F.col("n_j") * F.pow(F.col("zbar_j") - F.col("zbar"), F.lit(2))) / (F.col("k") - 1))
                / (F.col("ssw") / (F.col("n") - F.col("k"))),
                6,
            ).alias("f_stat")
        )
        .select(
            "f_stat",
            (F.col("k") - 1).cast("bigint").alias("dof_between"),
            (F.col("n") - F.col("k")).cast("bigint").alias("dof_within"),
        )
    )
