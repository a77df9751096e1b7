"""Fisher's exact test, fully in-plan (SURVEY.md §2B stats tier,
round 9).

The 2x2 exact test (Fisher 1935, public) the A/B tier was missing for
SMALL-sample conversion comparisons, where the chi-square normal
approximation (agg_chi_square) is unreliable. Exact tests are
small-n by definition, so the query fixes its n: the contingency
table is built over a deterministic md5-ordered panel of at most
PANEL_K users (the TakeOrderedAndProject idiom — a bounded,
reproducible "first 512 by hash" sample at any corpus size), which
bounds the hypergeometric support and keeps the whole computation
O(PANEL_K) regardless of data scale.

No lgamma exists in Spark SQL, so the log-factorial table is BUILT
IN-PLAN: the panel's row_number sequence 1..N, ln() of each, and a
running-sum window — a bounded, shared lookup the pmf joins against
at all six factorial offsets. DuckDB mirrors the same construction
(NOT its native lgamma) so both engines sum the identical ln series
in the identical order and the pmf comparisons cannot diverge in the
last ulp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.stats_sprt import CONV_MIN_PURCHASES
from target_iceberg_spark.sources.tables import load_table

PANEL_K = 512  # users in the test panel (md5-ordered head)
PMF_EPS = 1e-7  # two-sided inclusion tolerance on ln-pmf comparisons


@register(
    "agg_fisher_exact",
    oracle=f"""
WITH u AS (
    SELECT user_id,
           CAST(user_id % 2 AS INTEGER) AS arm,
           CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase')
                     >= {CONV_MIN_PURCHASES} THEN 1 ELSE 0 END AS conv
    FROM events GROUP BY user_id
),
panel AS (
    SELECT arm, conv FROM u
    ORDER BY md5(CAST(user_id AS VARCHAR)) LIMIT {PANEL_K}
),
cells AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(arm) AS BIGINT) AS r1,
           CAST(SUM(conv) AS BIGINT) AS c1,
           CAST(SUM(arm * conv) AS BIGINT) AS a
    FROM panel
),
ints AS (
    SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS i FROM panel
),
lfact AS (
    SELECT 0 AS i, CAST(0.0 AS DOUBLE) AS lf
    UNION ALL
    SELECT i, SUM(ln(CAST(i AS DOUBLE))) OVER (
        ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS lf
    FROM ints
),
kgrid AS (
    SELECT cells.*,
           UNNEST(generate_series(GREATEST(0, r1 + c1 - n),
                                  LEAST(r1, c1))) AS k
    FROM cells
),
pmf AS (
    SELECT kg.k, kg.a,
           lr1.lf + lr2.lf + lc1.lf + lc2.lf
           - ln_.lf - lk.lf - lr1k.lf - lc1k.lf - lrest.lf AS lp
    FROM kgrid kg
    JOIN lfact lr1 ON lr1.i = kg.r1
    JOIN lfact lr2 ON lr2.i = kg.n - kg.r1
    JOIN lfact lc1 ON lc1.i = kg.c1
    JOIN lfact lc2 ON lc2.i = kg.n - kg.c1
    JOIN lfact ln_ ON ln_.i = kg.n
    JOIN lfact lk ON lk.i = kg.k
    JOIN lfact lr1k ON lr1k.i = kg.r1 - kg.k
    JOIN lfact lc1k ON lc1k.i = kg.c1 - kg.k
    JOIN lfact lrest ON lrest.i = kg.n - kg.r1 - kg.c1 + kg.k
),
obs AS (SELECT lp AS lp_obs FROM pmf WHERE k = a)
SELECT cells.n AS n_panel, cells.a, cells.r1, cells.c1,
       ROUND((SELECT SUM(EXP(lp)) FROM pmf, obs
              WHERE lp <= lp_obs + {PMF_EPS}), 6) AS p_two_sided,
       ROUND((SELECT EXP(lp_obs) FROM obs), 6) AS p_observed
FROM cells
""",
    tags=("stats", "experimentation", "exact-test"),
)
def agg_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact two-sided p for arm (user_id parity) x
    conversion (>= {CONV_MIN_PURCHASES} purchases) over the
    md5-ordered {PANEL_K}-user panel: enumerate the hypergeometric
    support, compute each table's ln-pmf from the in-plan
    log-factorial table, and sum the probabilities of every table as
    or less likely than the observed one (ln-domain comparison with
    a {PMF_EPS} tolerance — the standard two-sided rule).

    Scale shape: the per-user flags are one combinable groupBy; the
    panel is TakeOrderedAndProject (top-{PANEL_K} by hash — no global
    sort materializes); everything downstream (ln-factorial window,
    support grid, six lookup joins, the pmf fold) runs on <=
    {PANEL_K}+1-row frames whatever the corpus size. This is the
    exact-test discipline: n is a design constant, so the O(n)
    enumeration is a plan literal, not a data term."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            >= CONV_MIN_PURCHASES
        )
        .cast("int")
        .alias("conv"),
    ).select(
        "user_id", (F.col("user_id") % 2).cast("int").alias("arm"), "conv"
    )
    # localCheckpoint: `panel` feeds cells, the row-number ladder AND
    # (through lfact) nine broadcast-lookup builds — without it each
    # build re-executes the corpus-sized groupBy + TakeOrdered
    # (guide §2.4 duplicated-subtree rule; PANEL_K rows materialized).
    panel = (
        u.orderBy(F.md5(F.col("user_id").cast("string")))
        .limit(PANEL_K)
        .select("arm", "conv")
    ).localCheckpoint()
    cells = panel.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("arm").cast("bigint").alias("r1"),
        F.sum("conv").cast("bigint").alias("c1"),
        F.sum(F.col("arm") * F.col("conv")).cast("bigint").alias("a"),
    )
    ints = panel.select(
        F.row_number().over(Window.orderBy(F.lit(1))).cast("bigint").alias("i")
    )
    lfact = ints.select(
        "i",
        F.sum(F.log(F.col("i").cast("double")))
        .over(
            Window.orderBy("i").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("lf"),
    ).unionAll(
        panel.sparkSession.createDataFrame(
            [(0, 0.0)], "i BIGINT, lf DOUBLE"
        )
    ).localCheckpoint()  # n+1 rows; reused by nine lookup joins
    kgrid = cells.select(
        "*",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0).cast("bigint"), F.col("r1") + F.col("c1") - F.col("n")),
                F.least(F.col("r1"), F.col("c1")),
            )
        ).alias("k"),
    )

    def lf_join(df, expr, alias):
        # broadcast-join the log-factorial lookup on the given index
        # expression, leaving one `alias` column behind
        tbl = F.broadcast(
            lfact.select(
                F.col("i").alias(f"_i_{alias}"), F.col("lf").alias(alias)
            )
        )
        return df.join(tbl, expr == F.col(f"_i_{alias}")).drop(
            f"_i_{alias}"
        )

    pmf = kgrid
    for alias, expr in [
        ("lf_r1", F.col("r1")),
        ("lf_r2", F.col("n") - F.col("r1")),
        ("lf_c1", F.col("c1")),
        ("lf_c2", F.col("n") - F.col("c1")),
        ("lf_n", F.col("n")),
        ("lf_k", F.col("k")),
        ("lf_r1k", F.col("r1") - F.col("k")),
        ("lf_c1k", F.col("c1") - F.col("k")),
        ("lf_rest", F.col("n") - F.col("r1") - F.col("c1") + F.col("k")),
    ]:
        pmf = lf_join(pmf, expr, alias)
    pmf = pmf.select(
        "n",
        "a",
        "r1",
        "c1",
        "k",
        (
            F.col("lf_r1")
            + F.col("lf_r2")
            + F.col("lf_c1")
            + F.col("lf_c2")
            - F.col("lf_n")
            - F.col("lf_k")
            - F.col("lf_r1k")
            - F.col("lf_c1k")
            - F.col("lf_rest")
        ).alias("lp"),
    )
    obs = pmf.where(F.col("k") == F.col("a")).select(
        F.col("lp").alias("lp_obs")
    )
    return (
        pmf.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n").alias("n_panel"),
            F.max("a").alias("a"),
            F.max("r1").alias("r1"),
            F.max("c1").alias("c1"),
            F.round(
                F.sum(
                    F.when(
                        F.col("lp") <= F.col("lp_obs") + PMF_EPS,
                        F.exp("lp"),
                    )
                ),
                6,
            ).alias("p_two_sided"),
            F.round(F.exp(F.max("lp_obs")), 6).alias("p_observed"),
        )
    )
