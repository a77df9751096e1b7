"""TOST equivalence testing (SURVEY.md §2B stats/experimentation
tier, round 8).

The two-one-sided-tests procedure (Schuirmann 1987, public): a
non-significant difference does NOT mean "the arms are the same" —
to CLAIM equivalence you show the effect is significantly inside
±margin on both sides. The missing half of the experimentation tier:
agg_ab_test detects differences, this certifies their absence — the
test a no-regression launch gate actually needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

TOST_MARGIN_REL = 0.05  # equivalence margin: ±5% of the pooled mean
TOST_Z = 1.644854  # one-sided 5% normal critical value


@register(
    "agg_tost_equivalence",
    oracle=f"""
WITH per_user AS (
    SELECT user_id, event_type, user_id % 2 AS arm,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y4
    FROM events GROUP BY user_id, event_type
),
mom AS (
    SELECT event_type, arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y4) AS BIGINT) AS s1,
           CAST(SUM(y4 * y4) AS BIGINT) AS s2
    FROM per_user GROUP BY event_type, arm
),
momd AS (
    SELECT event_type, arm, n,
           CAST(s1 AS DOUBLE) / (100.0 * n) AS m,
           (CAST(s2 AS DOUBLE) / 10000.0
            - (CAST(s1 AS DOUBLE) / 100.0) * (CAST(s1 AS DOUBLE) / 100.0)
              / n) / (n - 1) AS v
    FROM mom
),
wide AS (
    SELECT a.event_type,
           a.n AS n_a, b.n AS n_b,
           a.m AS m_a, b.m AS m_b,
           sqrt(a.v / a.n + b.v / b.n) AS se,
           {TOST_MARGIN_REL} * (a.m * a.n + b.m * b.n) / (a.n + b.n)
               AS margin
    FROM momd a JOIN momd b ON a.event_type = b.event_type
    WHERE a.arm = 0 AND b.arm = 1
)
SELECT event_type, n_a, n_b,
       CAST(FLOOR((m_b - m_a) * 10000.0 + 0.5) AS DOUBLE) / 10000.0
           AS diff,
       CAST(FLOOR(margin * 10000.0 + 0.5) AS DOUBLE) / 10000.0
           AS margin,
       ROUND((m_b - m_a + margin) / se, 4) AS t_lower,
       ROUND((margin - (m_b - m_a)) / se, 4) AS t_upper,
       ((m_b - m_a + margin) / se > {TOST_Z}
        AND (margin - (m_b - m_a)) / se > {TOST_Z}) AS equivalent
FROM wide
ORDER BY event_type
""",
    tags=("stats", "experimentation", "equivalence", "tost"),
)
def agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuirmann TOST per event type: is the arm difference in the
    per-user value metric provably inside ±{TOST_MARGIN_REL:.0%} of
    the pooled mean? Both one-sided Welch z statistics must clear the
    {TOST_Z} critical value — `equivalent` is the launch-gate
    boolean, `diff` vs `margin` shows how much room it had. A large
    but noisy difference and a tiny well-measured one both correctly
    fail/pass on the SAME output row.

    Scale shape: one combinable per-(user, type) sum, one tiny moment
    aggregate per (type, arm), a 2-row-per-type self-join, scalar
    arithmetic — the agg_ab_test plan with the hypotheses flipped.

    Round-12 exactness: the per-user metric sums EXACT cents
    (FLOOR(x*100+0.5) as BIGINT) and the moments are explicit integer
    sufficient statistics (n, Σy, Σy²) turned into mean/variance by
    ONE shared double expression per side — plain AVG/var_samp over
    doubles flipped `margin`'s 4th decimal at sf0.1 where the engines'
    sum orders differ in the last ulp (sf0.1 parity sweep). Σy² of
    cents stays far under 2^63 here; a corpus where it wouldn't uses
    DECIMAL sums (the agg_decimal_ledger form)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("y4")
    ).select(
        "event_type", (F.col("user_id") % 2).alias("arm"), "y4"
    )
    mom = per_user.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y4").cast("bigint").alias("s1"),
        F.sum(F.col("y4") * F.col("y4")).cast("bigint").alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    mom = mom.select(
        "event_type",
        "arm",
        "n",
        (s1d / (F.lit(100.0) * F.col("n"))).alias("m"),
        (
            (
                F.col("s2").cast("double") / F.lit(10000.0)
                - (s1d / F.lit(100.0)) * (s1d / F.lit(100.0)) / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("v"),
    )
    a = mom.where(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
        F.col("v").alias("v_a"),
    )
    b = mom.where(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
        F.col("v").alias("v_b"),
    )
    w = a.join(b, "event_type")
    se = F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b"))
    margin = TOST_MARGIN_REL * (
        F.col("m_a") * F.col("n_a") + F.col("m_b") * F.col("n_b")
    ) / (F.col("n_a") + F.col("n_b"))
    diff = F.col("m_b") - F.col("m_a")
    t_lo = (diff + margin) / se
    t_hi = (margin - diff) / se
    from target_iceberg_spark.functions.rounding import portable_round

    return w.select(
        "event_type",
        "n_a",
        "n_b",
        portable_round(diff, 4).alias("diff"),
        portable_round(margin, 4).alias("margin"),
        F.round(t_lo, 4).alias("t_lower"),
        F.round(t_hi, 4).alias("t_upper"),
        ((t_lo > TOST_Z) & (t_hi > TOST_Z)).alias("equivalent"),
    ).orderBy("event_type")
