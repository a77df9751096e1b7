"""Kendall tau-b rank correlation on a constant-size deterministic
sample (SURVEY.md §2B stats tier, round 10).

Complements the existing rank tier (agg_spearman is the O(N) rank
correlation; agg_theil_sen the robust slope): Kendall's tau-b
(Kendall 1945 tie correction, public) is the concordance measure
metric platforms quote when the pair-level interpretation matters
("probability a random pair moves together"), and its pair-counting
form is the textbook example of an operator that must NOT be run
all-pairs at corpus scale.

The 100 TB shape is therefore explicit in the plan: tau is estimated
on a CONSTANT-size sample (the KENDALL_N smallest md5(o_orderkey)
hashes — a deterministic uniform draw both engines reproduce
exactly), so the self-join is KENDALL_N^2/2 pairs REGARDLESS of data
size; the only full-data work is the hash + top-N (TakeOrdered, no
global sort). Doubling the corpus does not change the join volume —
the audit cost is fixed, like agg_approx_distinct's bounded exact arm.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

KENDALL_N = 400  # constant sample => pair volume is a compile-time bound


@register(
    "agg_kendall_tau",
    oracle=f"""
WITH samp AS (
    SELECT o_orderkey, o_totalprice AS x,
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS y
    FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT {KENDALL_N}
),
pairs AS (
    SELECT CASE WHEN a.x < b.x THEN -1 WHEN a.x > b.x THEN 1 ELSE 0 END AS sx,
           CASE WHEN a.y < b.y THEN -1 WHEN a.y > b.y THEN 1 ELSE 0 END AS sy
    FROM samp a JOIN samp b ON a.o_orderkey < b.o_orderkey
),
counts AS (
    SELECT CAST(SUM(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS n0,
           CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
           CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
    FROM pairs
)
SELECT c AS concordant, d AS discordant, n0 AS pairs, tx AS ties_x, ty AS ties_y,
       ROUND((c - d) / SQRT(CAST((n0 - tx) AS DOUBLE) * (n0 - ty)), 6) AS tau_b
FROM counts
""",
    tags=("stats", "rank", "correlation", "bounded-sample"),
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between order value and order date on the
    KENDALL_N-row deterministic md5 sample: count concordant /
    discordant / tied pairs over the i<j self-join, apply the tie-
    corrected denominator sqrt((n0-t_x)(n0-t_y)).

    Scale shape: the full-data pass is hash + TakeOrdered(KENDALL_N)
    (Spark's limit-after-sort compiles to a per-partition top-N +
    single merge — no global sort); the pair join is a broadcast
    self-join of a constant 400-row table (~80k pairs at ANY corpus
    size). Pair ties (sx=0 / sy=0) are counted inside the same
    aggregate — no second pass over the sample."""
    orders = load_table(spark, sf_dir, "orders")
    samp = (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").alias("x"),
            F.unix_date(F.col("o_orderdate").cast("date")).cast("bigint").alias("y"),
            F.md5(F.col("o_orderkey").cast("string")).alias("_h"),
        )
        .orderBy("_h", "o_orderkey")
        .limit(KENDALL_N)
        .drop("_h")
    )
    a, b = samp.alias("a"), samp.alias("b")
    sgn = lambda l, r: F.when(l < r, F.lit(-1)).when(l > r, F.lit(1)).otherwise(F.lit(0))  # noqa: E731
    pairs = a.join(
        F.broadcast(b), F.col("a.o_orderkey") < F.col("b.o_orderkey")
    ).select(
        sgn(F.col("a.x"), F.col("b.x")).alias("sx"),
        sgn(F.col("a.y"), F.col("b.y")).alias("sy"),
    )
    counts = pairs.agg(
        F.sum(F.when(F.col("sx") * F.col("sy") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(F.col("sx") * F.col("sy") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0)).cast("bigint").alias("tx"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0)).cast("bigint").alias("ty"),
    )
    return counts.select(
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("n0").alias("pairs"),
        F.col("tx").alias("ties_x"),
        F.col("ty").alias("ties_y"),
        F.round(
            (F.col("c") - F.col("d"))
            / F.sqrt(
                (F.col("n0") - F.col("tx")).cast("double") * (F.col("n0") - F.col("ty"))
            ),
            6,
        ).alias("tau_b"),
    )
