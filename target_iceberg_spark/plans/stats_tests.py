"""Hypothesis-test aggregates round 2 (SURVEY.md §2B analytics tier,
round 6): chi-square independence, Mann-Whitney rank-sum, and a
deterministic Bayesian-bootstrap confidence interval.

Completes the inference tier started in stats_inference.py (Welch's t
is the parametric two-sample test; Mann-Whitney is its nonparametric
counterpart; chi-square covers categorical association; the bootstrap
covers statistics with no closed-form SE). Every full-data stage is a
combinable aggregation; the test arithmetic runs on grouped rows a few
dozen wide.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

BOOT_B = 32  # bootstrap replicates
BOOT_Z = 1.96  # normal-approx CI half-width multiplier


@register(
    "agg_chi_square",
    oracle="""
WITH obs AS (
    SELECT o_orderstatus AS status, o_orderpriority AS pri,
           COUNT(*) AS o
    FROM orders GROUP BY o_orderstatus, o_orderpriority
),
rows_m AS (SELECT status, SUM(o) AS r_tot FROM obs GROUP BY status),
cols_m AS (SELECT pri, SUM(o) AS c_tot FROM obs GROUP BY pri),
n AS (SELECT SUM(o) AS n FROM obs),
grid AS (
    SELECT r.status, c.pri, r.r_tot, c.c_tot, n.n,
           COALESCE(o.o, 0) AS o,
           r.r_tot * c.c_tot / CAST(n.n AS DOUBLE) AS e
    FROM rows_m r CROSS JOIN cols_m c CROSS JOIN n
    LEFT JOIN obs o ON o.status = r.status AND o.pri = c.pri
),
cells AS (
    SELECT SUM((o - e) * (o - e) / e) AS chi2,
           CAST(COUNT(DISTINCT status) AS BIGINT) AS r,
           CAST(COUNT(DISTINCT pri) AS BIGINT) AS c,
           MAX(n) AS n
    FROM grid
)
SELECT CAST(n AS BIGINT) AS n, r, c,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       ROUND(chi2, 4) AS chi2,
       ROUND(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v
FROM cells
""",
    tags=("aggregate", "statistics", "independence"),
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between order status
    and order priority, with Cramér's V effect size: observed cell
    counts vs the expected row*col/N products over the FULL category
    grid — zero-observation cells contribute their full expected count
    (dropping them understates the statistic, the classic sparse-grid
    mistake), so the grid is the cross join of the two marginal
    frames, left-joined against observations.

    Scale shape: one combinable COUNT per (status, priority) is the
    only full-data stage; marginals are re-aggregations of that
    dozens-of-rows frame, and the grid/statistic arithmetic runs on
    r*c rows (15 here). No window, no skew. The categorical-
    association readout every feature-audit and drift pipeline runs
    next to profile_drift_psi's numeric one."""
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_m = obs.groupBy("status").agg(F.sum("o").alias("r_tot"))
    cols_m = obs.groupBy("pri").agg(F.sum("o").alias("c_tot"))
    n = obs.agg(F.sum("o").alias("n"))
    grid = (
        rows_m.crossJoin(F.broadcast(cols_m))
        .crossJoin(F.broadcast(n))
        .join(obs, ["status", "pri"], "left")
        .select(
            "status",
            "pri",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (
                F.col("r_tot") * F.col("c_tot") / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    cells = grid.agg(
        F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")).alias("chi2"),
        F.countDistinct("status").alias("r"),
        F.countDistinct("pri").alias("c"),
        F.max("n").alias("n"),
    )
    return cells.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("r").cast("bigint").alias("r"),
        F.col("c").cast("bigint").alias("c"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        F.round("chi2", 4).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "agg_mann_whitney",
    oracle="""
WITH vals AS (
    SELECT o_orderpriority AS pri, o_totalprice AS v,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f
    FROM orders WHERE o_orderstatus IN ('F', 'O')
),
per_val AS (
    SELECT pri, v,
           CAST(SUM(is_f) AS DOUBLE) AS c_f,
           CAST(COUNT(*) AS DOUBLE) AS c_all
    FROM vals GROUP BY pri, v
),
swept AS (
    SELECT pri, c_f, c_all,
           COALESCE(SUM(c_all) OVER (
               PARTITION BY pri ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) + (c_all + 1) / 2.0 AS midrank
    FROM per_val
),
stats AS (
    SELECT pri,
           SUM(c_f) AS n_f,
           SUM(c_all) - SUM(c_f) AS n_o,
           SUM(c_all) AS n,
           SUM(c_f * midrank) AS r_f,
           SUM(c_all * c_all * c_all - c_all) AS tie3
    FROM swept GROUP BY pri
)
SELECT pri,
       CAST(n_f AS BIGINT) AS n_f,
       CAST(n_o AS BIGINT) AS n_o,
       ROUND(r_f - n_f * (n_f + 1) / 2.0, 2) AS u_stat,
       ROUND(
           (r_f - n_f * (n_f + 1) / 2.0 - n_f * n_o / 2.0)
           / sqrt(n_f * n_o / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))),
           4) AS z
FROM stats
ORDER BY pri
""",
    tags=("aggregate", "statistics", "nonparametric"),
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test of order value between finished
    ('F') and open ('O') orders, per priority class — the
    nonparametric counterpart to agg_ab_test's Welch t (no normality
    assumption, robust to the heavy-tailed revenue distributions real
    pipelines see). Midranks come from the distinct-VALUE cumulative
    sweep (agg_weighted_percentile's discipline): per distinct price,
    the count below it plus half its own tie block; U and the
    tie-corrected normal approximation z follow in closed form.

    Scale shape: the only full-data stage is the combinable
    (priority, value) count; the rank window runs over DISTINCT
    values per priority (bounded by value cardinality, never row
    count — the whitelisted bounded-window class), and the test
    arithmetic is one grouped aggregation over that swept frame.
    Pairwise rank comparisons never materialize."""
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.where(F.col("o_orderstatus").isin("F", "O")).select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_f"),
    )
    per_val = vals.groupBy("pri", "v").agg(
        F.sum("is_f").cast("double").alias("c_f"),
        F.count(F.lit(1)).cast("double").alias("c_all"),
    )
    sweep = (
        Window.partitionBy("pri")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = per_val.select(
        "pri",
        "c_f",
        "c_all",
        (
            F.coalesce(F.sum("c_all").over(sweep), F.lit(0.0))
            + (F.col("c_all") + 1) / 2.0
        ).alias("midrank"),
    )
    stats = swept.groupBy("pri").agg(
        F.sum("c_f").alias("n_f"),
        (F.sum("c_all") - F.sum("c_f")).alias("n_o"),
        F.sum("c_all").alias("n"),
        F.sum(F.col("c_f") * F.col("midrank")).alias("r_f"),
        F.sum(
            F.col("c_all") * F.col("c_all") * F.col("c_all") - F.col("c_all")
        ).alias("tie3"),
    )
    u = F.col("r_f") - F.col("n_f") * (F.col("n_f") + 1) / 2.0
    var_u = (
        F.col("n_f")
        * F.col("n_o")
        / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie3") / (F.col("n") * (F.col("n") - 1))
        )
    )
    return (
        stats.select(
            "pri",
            F.col("n_f").cast("bigint").alias("n_f"),
            F.col("n_o").cast("bigint").alias("n_o"),
            F.round(u, 2).alias("u_stat"),
            F.round(
                (u - F.col("n_f") * F.col("n_o") / 2.0) / F.sqrt(var_u), 4
            ).alias("z"),
        )
        .orderBy("pri")
    )


@register(
    "agg_bootstrap_ci",
    oracle=f"""
WITH weighted AS (
    SELECT pri, b,
           -ln((CAST(concat('0x', substr(
                    md5(CAST(o_orderkey AS VARCHAR) || '_'
                        || CAST(b // 4 AS VARCHAR)),
                    (b % 4) * 8 + 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0) AS w,
           v
    FROM (
        SELECT o_orderpriority AS pri, o_totalprice AS v, o_orderkey,
               unnest(range(0, {BOOT_B})) AS b
        FROM orders
    )
),
rep_means AS (
    SELECT pri, b, SUM(w * v) / SUM(w) AS m
    FROM weighted GROUP BY pri, b
),
ci AS (
    SELECT pri, AVG(m) AS est, STDDEV_SAMP(m) AS se
    FROM rep_means GROUP BY pri
)
SELECT pri,
       ROUND(est, 4) AS est,
       ROUND(se, 4) AS se,
       ROUND(est - {BOOT_Z} * se, 4) AS ci_lo,
       ROUND(est + {BOOT_Z} * se, 4) AS ci_hi
FROM ci
ORDER BY pri
""",
    tags=("aggregate", "statistics", "bootstrap"),
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian-bootstrap confidence interval (Rubin 1981, public) for
    mean order value per priority: {BOOT_B} replicates, each
    reweighting every order by an exponential draw -ln(u) with u
    DERIVED FROM md5(o_orderkey, replicate) — the smooth-weight
    bootstrap whose replicate means need no resampling pass, and
    whose md5-seeded draws make the whole simulation bit-reproducible
    across engines AND reruns (F.rand would give neither; the
    sample_weighted / emb_jl_projection discipline). The CI is the
    normal approximation est ± {BOOT_Z}·SE, SE = the replicate-mean
    standard deviation — no percentile interpolation, whose formula
    varies by engine.

    Scale shape: each row fans out ×{BOOT_B} map-side (a plan-local
    explode, no shuffle), then ONE combinable weighted-sum aggregation
    per (priority, replicate) — partial aggregation absorbs the
    fan-out before any exchange, so shuffle volume is
    #groups × {BOOT_B} rows regardless of table size. The replicate
    frame (5 × {BOOT_B} rows) reduces to the CI in a second tiny
    aggregation. This is how a pipeline puts error bars on ANY
    combinable statistic at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    # one md5 yields FOUR 8-hex-char uniforms (32 hex chars = 4
    # disjoint 8-char words). Round-13 shape (optimization guide §1.2
    # step 2): explode in TWO levels — first the BOOT_B/4 hash groups,
    # project the md5 ONCE per (row, group), then posexplode the four
    # word-derived weights. The previous single-level explode inlined
    # the md5 into the per-replicate expression, so Catalyst evaluated
    # the SAME digest for each of its four consumers (no cross-row
    # subexpression sharing through an explode): 4x the md5 calls for
    # identical bytes. Same-JVM A/B: 2.04 -> 1.24 s (0.61x), replicate
    # means bit-identical. Deliberately FLAT codegen expressions per
    # element, not a transform() lambda: higher-order functions run
    # interpreted and measured ~80x slower end-to-end.
    # spread the fan-out across the cluster BEFORE exploding: a
    # compact table often arrives as a handful of input splits, and
    # without this the entire B-fold hashing runs on those few tasks
    # (measured 3.9 s single-task vs 0.5 s spread at sf0.1). The
    # repartition shuffles only the slim base rows, never the fan-out.
    groups = (
        orders.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_totalprice").alias("v"),
            F.explode(
                F.sequence(F.lit(0), F.lit(BOOT_B // 4 - 1))
            ).alias("b4"),
            "o_orderkey",
        )
        .select(
            "pri",
            "v",
            "b4",
            F.md5(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit("_"),
                    F.col("b4").cast("string"),
                )
            ).alias("h"),
        )
    )
    # w for word i: the identical expression tree the single-level
    # form produced at offset (b % 4) * 8 + 1, with b = b4 * 4 + i.
    words = groups.select(
        "pri",
        "v",
        "b4",
        F.posexplode(
            F.array(
                *[
                    -F.log(
                        (
                            F.expr(
                                f"cast(conv(substring(h, {i * 8 + 1}, 8),"
                                " 16, 10) as double)"
                            )
                            + F.lit(0.5)
                        )
                        / F.lit(4294967296.0)
                    )
                    for i in range(4)
                ]
            )
        ).alias("pos", "w"),
    )
    weighted = words.select(
        "pri", (F.col("b4") * 4 + F.col("pos")).alias("b"), "w", "v"
    )
    rep_means = weighted.groupBy("pri", "b").agg(
        (F.sum(F.col("w") * F.col("v")) / F.sum("w")).alias("m")
    )
    ci = rep_means.groupBy("pri").agg(
        F.avg("m").alias("est"), F.stddev_samp("m").alias("se")
    )
    return ci.select(
        "pri",
        F.round("est", 4).alias("est"),
        F.round("se", 4).alias("se"),
        F.round(F.col("est") - BOOT_Z * F.col("se"), 4).alias("ci_lo"),
        F.round(F.col("est") + BOOT_Z * F.col("se"), 4).alias("ci_hi"),
    ).orderBy("pri")


@register(
    "agg_ks_test",
    oracle="""
WITH vals AS (
    SELECT o_orderpriority AS pri, o_totalprice AS v,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f
    FROM orders WHERE o_orderstatus IN ('F', 'O')
),
per_val AS (
    SELECT pri, v,
           CAST(SUM(is_f) AS DOUBLE) AS c_f,
           CAST(COUNT(*) - SUM(is_f) AS DOUBLE) AS c_o
    FROM vals GROUP BY pri, v
),
tot AS (
    SELECT pri, SUM(c_f) AS n_f, SUM(c_o) AS n_o
    FROM per_val GROUP BY pri
),
ecdf AS (
    SELECT p.pri,
           SUM(p.c_f) OVER (
               PARTITION BY p.pri ORDER BY p.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / t.n_f AS f_f,
           SUM(p.c_o) OVER (
               PARTITION BY p.pri ORDER BY p.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / t.n_o AS f_o,
           t.n_f, t.n_o
    FROM per_val p JOIN tot t USING (pri)
)
SELECT pri,
       CAST(n_f AS BIGINT) AS n_f,
       CAST(n_o AS BIGINT) AS n_o,
       ROUND(MAX(abs(f_f - f_o)), 6) AS d_stat,
       ROUND(MAX(abs(f_f - f_o))
             * sqrt(n_f * n_o / (n_f + n_o)), 4) AS ks_scaled
FROM ecdf
GROUP BY pri, n_f, n_o
ORDER BY pri
""",
    tags=("aggregate", "statistics", "nonparametric"),
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic for order value between
    finished ('F') and open ('O') orders per priority: the maximum
    gap between the two empirical CDFs, plus the sqrt(n_f*n_o/n)
    scaling the KS significance tables take. Completes the
    two-sample toolkit (Welch t = means, Mann-Whitney = ranks, KS =
    whole-distribution shape) — the distribution-drift test feature
    stores run between training snapshots.

    Scale shape: identical to agg_mann_whitney — ONE combinable
    (priority, value) count, a cumulative window over DISTINCT values
    per priority (bounded by value cardinality), and a final grouped
    MAX. ECDF steps at distinct values are exactly where the sup gap
    is attained, so the sweep is exact, not a discretization. ECDFs
    are ratios of exact counts, so rounding at 6 is boundary-safe."""
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.where(F.col("o_orderstatus").isin("F", "O")).select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_f"),
    )
    per_val = vals.groupBy("pri", "v").agg(
        F.sum("is_f").cast("double").alias("c_f"),
        (F.count(F.lit(1)) - F.sum("is_f")).cast("double").alias("c_o"),
    )
    tot = per_val.groupBy("pri").agg(
        F.sum("c_f").alias("n_f"), F.sum("c_o").alias("n_o")
    )
    sweep = (
        Window.partitionBy("pri")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = per_val.join(tot, "pri").select(
        "pri",
        (F.sum("c_f").over(sweep) / F.col("n_f")).alias("f_f"),
        (F.sum("c_o").over(sweep) / F.col("n_o")).alias("f_o"),
        "n_f",
        "n_o",
    )
    gap = F.max(F.abs(F.col("f_f") - F.col("f_o")))
    return (
        ecdf.groupBy("pri", "n_f", "n_o")
        .agg(
            F.round(gap, 6).alias("d_stat"),
            F.round(
                gap
                * F.sqrt(
                    F.col("n_f") * F.col("n_o") / (F.col("n_f") + F.col("n_o"))
                ),
                4,
            ).alias("ks_scaled"),
        )
        .select(
            "pri",
            F.col("n_f").cast("bigint").alias("n_f"),
            F.col("n_o").cast("bigint").alias("n_o"),
            "d_stat",
            "ks_scaled",
        )
        .orderBy("pri")
    )
