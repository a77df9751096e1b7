"""Difference-in-differences estimator (SURVEY.md §2B stats tier,
round 9).

When treatment was NOT randomized per-event (a feature shipped to odd
user ids on a launch date), the naive post-launch comparison absorbs
any shared time trend. DiD (Card & Krueger AER'94 canonical form,
public) removes it: estimate = (treat_post - treat_pre) -
(control_post - control_pre), with the standard error folded from the
four cells' variances — the workhorse quasi-experimental readout, run
here as one cube-shaped aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

DID_LAUNCH = "2024-01-16"  # post period starts here
DID_Z_CRIT = 1.959963984540054  # two-sided 5%


@register(
    "agg_diff_in_diff",
    oracle=f"""
WITH cells AS (
    SELECT (user_id % 2 = 1) AS treat,
           (ts >= TIMESTAMP '{DID_LAUNCH}') AS post,
           AVG(value) AS m,
           VAR_SAMP(value) AS v,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
),
wide AS (
    SELECT
        MAX(CASE WHEN treat AND post THEN m END) AS m_tp,
        MAX(CASE WHEN treat AND NOT post THEN m END) AS m_t0,
        MAX(CASE WHEN NOT treat AND post THEN m END) AS m_cp,
        MAX(CASE WHEN NOT treat AND NOT post THEN m END) AS m_c0,
        MAX(CASE WHEN treat AND post THEN v / n END) AS s_tp,
        MAX(CASE WHEN treat AND NOT post THEN v / n END) AS s_t0,
        MAX(CASE WHEN NOT treat AND post THEN v / n END) AS s_cp,
        MAX(CASE WHEN NOT treat AND NOT post THEN v / n END) AS s_c0,
        CAST(SUM(n) AS BIGINT) AS n_total
    FROM cells
)
SELECT n_total,
       ROUND(m_tp, 4) AS mean_treat_post,
       ROUND(m_t0, 4) AS mean_treat_pre,
       ROUND(m_cp, 4) AS mean_control_post,
       ROUND(m_c0, 4) AS mean_control_pre,
       ROUND((m_tp - m_t0) - (m_cp - m_c0), 6) AS did_estimate,
       ROUND(sqrt(s_tp + s_t0 + s_cp + s_c0), 6) AS se,
       ROUND(((m_tp - m_t0) - (m_cp - m_c0))
             / sqrt(s_tp + s_t0 + s_cp + s_c0), 6) AS z,
       ABS(((m_tp - m_t0) - (m_cp - m_c0))
           / sqrt(s_tp + s_t0 + s_cp + s_c0)) > {DID_Z_CRIT}
           AS significant
FROM wide
""",
    tags=("stats", "experimentation", "causal"),
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD on purchase value: treatment = odd user ids, post = events
    on/after {DID_LAUNCH}. Emits the four cell means, the DiD
    estimate, its pooled standard error sqrt(sum v_i/n_i), the z
    score, and the 5% decision.

    Scale shape: ONE combinable groupBy over the filtered events
    produces the four sufficient-statistic cells; the pivot to a
    single row is a 4-row fold. No shuffle carries more than four
    rows past the first aggregate, and the purchase filter is pushed
    to the scan."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    cells = ev.groupBy(
        (F.col("user_id") % 2 == 1).alias("treat"),
        (F.col("ts") >= F.lit(DID_LAUNCH).cast("timestamp_ntz")).alias("post"),
    ).agg(
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )

    def cell(tr: bool, po: bool, col: str) -> F.Column:
        cond = (F.col("treat") == tr) & (F.col("post") == po)
        return F.max(F.when(cond, F.col(col)))

    wide = cells.agg(
        cell(True, True, "m").alias("m_tp"),
        cell(True, False, "m").alias("m_t0"),
        cell(False, True, "m").alias("m_cp"),
        cell(False, False, "m").alias("m_c0"),
        F.max(
            F.when((F.col("treat")) & (F.col("post")), F.col("v") / F.col("n"))
        ).alias("s_tp"),
        F.max(
            F.when((F.col("treat")) & (~F.col("post")), F.col("v") / F.col("n"))
        ).alias("s_t0"),
        F.max(
            F.when((~F.col("treat")) & (F.col("post")), F.col("v") / F.col("n"))
        ).alias("s_cp"),
        F.max(
            F.when((~F.col("treat")) & (~F.col("post")), F.col("v") / F.col("n"))
        ).alias("s_c0"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    did = (F.col("m_tp") - F.col("m_t0")) - (F.col("m_cp") - F.col("m_c0"))
    se = F.sqrt(
        F.col("s_tp") + F.col("s_t0") + F.col("s_cp") + F.col("s_c0")
    )
    return wide.select(
        "n_total",
        F.round("m_tp", 4).alias("mean_treat_post"),
        F.round("m_t0", 4).alias("mean_treat_pre"),
        F.round("m_cp", 4).alias("mean_control_post"),
        F.round("m_c0", 4).alias("mean_control_pre"),
        F.round(did, 6).alias("did_estimate"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 6).alias("z"),
        (F.abs(did / se) > DID_Z_CRIT).alias("significant"),
    )
