"""Statistical-inference aggregates (SURVEY.md §2B analytics tier,
round-5 post-window).

Three aggregate shapes every large-scale experimentation / logistics
stack needs that plain GROUP BY cannot express directly, each built so
the only full-data stage is a combinable aggregation:

  * agg_ab_test          — Welch's unequal-variance t-test per cohort
  * agg_weighted_percentile — exact weighted quantiles via the
                              distinct-value cum-weight sweep
  * agg_max_concurrent   — peak interval concurrency via the +1/-1
                              boundary sweep (no pairwise overlap join)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

TOP_SUPPLIERS = 20


@register(
    "agg_ab_test",
    oracle="""
WITH per_user AS (
    SELECT user_id % 2 AS arm, event_type,
           SUM(value) AS user_value
    FROM events
    GROUP BY user_id % 2, event_type, user_id
),
arms AS (
    SELECT event_type, arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           AVG(user_value) AS mean_v,
           VAR_SAMP(user_value) AS var_v
    FROM per_user
    GROUP BY event_type, arm
),
paired AS (
    SELECT a.event_type,
           a.n AS n_a, b.n AS n_b,
           a.mean_v AS mean_a, b.mean_v AS mean_b,
           a.var_v / a.n AS sa, b.var_v / b.n AS sb,
           a.var_v AS var_a, b.var_v AS var_b
    FROM arms a JOIN arms b USING (event_type)
    WHERE a.arm = 0 AND b.arm = 1
)
SELECT event_type, n_a, n_b,
       ROUND(mean_a, 4) AS mean_a,
       ROUND(mean_b, 4) AS mean_b,
       ROUND((mean_a - mean_b) / sqrt(sa + sb), 4) AS t_stat,
       ROUND(pow(sa + sb, 2)
             / (pow(sa, 2) / (n_a - 1) + pow(sb, 2) / (n_b - 1)),
             2) AS welch_df
FROM paired
ORDER BY event_type
""",
    tags=("aggregate", "statistics", "experimentation"),
)
def agg_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test per event_type between two
    deterministic experiment arms (user_id parity): per-user exposure
    totals, then per-arm n/mean/sample-variance, then the t statistic
    and Welch–Satterthwaite degrees of freedom in closed form.

    Scale shape: the experiment readout every A/B platform runs at
    100 TB. Both aggregation levels (per-user, then per-arm) are
    map-side-combinable sums/counts — variance comes from VAR_SAMP's
    partial-merge implementation, never a second scan — and the final
    t/df arithmetic runs on #event_types × 2 rows. The arm pairing is
    a self-join on an aggregate a few rows wide. No window, no skew:
    user_id parity splits uniformly by construction."""
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.groupBy(
            (F.col("user_id") % 2).alias("arm"), "event_type", "user_id"
        ).agg(F.sum("value").alias("user_value"))
    )
    arms = per_user.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("user_value").alias("mean_v"),
        F.var_samp("user_value").alias("var_v"),
    )
    a = arms.where(F.col("arm") == 0).alias("a")
    b = arms.where(F.col("arm") == 1).alias("b")
    sa = F.col("a.var_v") / F.col("a.n")
    sb = F.col("b.var_v") / F.col("b.n")
    return (
        a.join(b, F.col("a.event_type") == F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(F.col("a.mean_v"), 4).alias("mean_a"),
            F.round(F.col("b.mean_v"), 4).alias("mean_b"),
            F.round(
                (F.col("a.mean_v") - F.col("b.mean_v")) / F.sqrt(sa + sb), 4
            ).alias("t_stat"),
            F.round(
                F.pow(sa + sb, F.lit(2))
                / (
                    F.pow(sa, F.lit(2)) / (F.col("a.n") - 1)
                    + F.pow(sb, F.lit(2)) / (F.col("b.n") - 1)
                ),
                2,
            ).alias("welch_df"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_weighted_percentile",
    oracle="""
WITH by_value AS (
    SELECT l_returnflag, l_extendedprice AS price,
           SUM(l_quantity) AS w
    FROM lineitem
    GROUP BY l_returnflag, l_extendedprice
),
sweep AS (
    SELECT l_returnflag, price,
           SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cum_w,
           SUM(w) OVER (PARTITION BY l_returnflag) AS total_w
    FROM by_value
)
SELECT l_returnflag,
       MIN(CASE WHEN cum_w >= 0.5 * total_w THEN price END) AS wmedian_price,
       MIN(CASE WHEN cum_w >= 0.9 * total_w THEN price END) AS wp90_price
FROM sweep
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "statistics", "percentile"),
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted quantiles (median and p90 of extended price,
    weighted by quantity) per return flag — the statistic
    percentile_approx cannot give you exactly and plain percentile
    cannot weight.

    Scale shape: the naive formulation sorts every row inside a
    3-partition window — a skew bomb at 100 TB. This plan collapses to
    DISTINCT VALUES first (groupBy (flag, price): map-side-combinable
    weight sums), so the cum-weight sweep window runs over value
    cardinality, not row count — the same pre-aggregate-then-window
    discipline as profile_topk_values. The quantile is then the first
    value whose cumulative weight crosses q·total, picked with one
    conditional MIN — no second sort, stable under ties because every
    distinct value appears exactly once in the sweep."""
    # fanout A/B'd round 13 and REJECTED (off 2.23 s -> on 4.09 s,
    # 1.84x): the keyless repartition shuffles all 600k raw rows while
    # the pre-aggregate's own exchange already spreads the sweep.
    li = load_table(spark, sf_dir, "lineitem")
    by_value = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum("l_quantity").alias("w"))
    w_flag = Window.partitionBy("l_returnflag")
    sweep = by_value.select(
        "l_returnflag",
        "price",
        F.sum("w").over(w_flag.orderBy("price")).alias("cum_w"),
        F.sum("w").over(w_flag).alias("total_w"),
    )
    return (
        sweep.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(F.col("cum_w") >= 0.5 * F.col("total_w"), F.col("price"))
            ).alias("wmedian_price"),
            F.min(
                F.when(F.col("cum_w") >= 0.9 * F.col("total_w"), F.col("price"))
            ).alias("wp90_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_max_concurrent",
    oracle=f"""
WITH deltas AS (
    SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d, 1 AS delta
    FROM lineitem
    UNION ALL
    -- transit ends (1 + l_orderkey % 14) days after shipment; the -1
    -- boundary lands the day AFTER the inclusive interval end
    SELECT l_suppkey,
           CAST(l_shipdate AS DATE) + CAST(l_orderkey % 14 + 2 AS INTEGER),
           -1
    FROM lineitem
),
per_day AS (
    SELECT l_suppkey, d, CAST(SUM(delta) AS BIGINT) AS net
    FROM deltas GROUP BY l_suppkey, d
),
swept AS (
    SELECT l_suppkey,
           SUM(net) OVER (PARTITION BY l_suppkey ORDER BY d) AS live
    FROM per_day
)
SELECT l_suppkey, CAST(MAX(live) AS BIGINT) AS max_in_transit
FROM swept
GROUP BY l_suppkey
ORDER BY max_in_transit DESC, l_suppkey
LIMIT {TOP_SUPPLIERS}
""",
    tags=("aggregate", "intervals", "sweep"),
)
def agg_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of SIMULTANEOUSLY in-transit shipments per supplier
    — intervals [l_shipdate, l_shipdate + transit] with a deterministic
    per-shipment transit time (1 + l_orderkey % 14 days; the synthetic
    lineitem has no receipt date) — the classic
    max-interval-overlap problem, solved with the boundary sweep:
    +1 at each start, -1 the day after each end, collapse boundaries
    per (supplier, day), running-sum per supplier, take the max.

    Scale shape: the pairwise formulation is an O(n²) self-overlap-join
    per supplier; the sweep is one union (a plan-level concatenation,
    no shuffle), one map-side-combinable groupBy, and a window over
    DISTINCT BOUNDARY DAYS per supplier — bounded by the calendar
    (~2.5k days), never by shipment count. TakeOrderedAndProject
    finishes the top-{TOP_SUPPLIERS} report. This is the shape that
    survives 100 TB of shipment rows."""
    # fanout A/B'd round 13 and REJECTED (off 2.21 s -> on 3.65 s,
    # 1.65x): both union branches pay the keyless repartition while the
    # per-day groupBy's exchange already spreads the sweep.
    li = load_table(spark, sf_dir, "lineitem")
    starts = li.select(
        "l_suppkey", F.col("l_shipdate").alias("d"), F.lit(1).alias("delta")
    )
    ends = li.select(
        "l_suppkey",
        F.date_add(
            "l_shipdate", (F.col("l_orderkey") % 14 + 2).cast("int")
        ).alias("d"),
        F.lit(-1).alias("delta"),
    )
    per_day = (
        starts.unionAll(ends)
        .groupBy("l_suppkey", "d")
        .agg(F.sum("delta").cast("bigint").alias("net"))
    )
    live = F.sum("net").over(Window.partitionBy("l_suppkey").orderBy("d"))
    return (
        per_day.select("l_suppkey", live.alias("live"))
        .groupBy("l_suppkey")
        .agg(F.max("live").cast("bigint").alias("max_in_transit"))
        .orderBy(F.desc("max_in_transit"), "l_suppkey")
        .limit(TOP_SUPPLIERS)
    )


GINI_BIN_WIDTH = 50_000.0  # customer-spend bin width (spend <= ~7.5M)


@register(
    "agg_gini_binned",
    oracle=f"""
WITH spend AS (
    SELECT o_custkey, SUM(o_totalprice) AS s
    FROM orders GROUP BY o_custkey
),
bins AS (
    SELECT CAST(floor(s / {GINI_BIN_WIDTH}) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n, SUM(s) AS tot
    FROM spend GROUP BY 1
),
lorenz AS (
    SELECT bin, n, tot,
           SUM(n) OVER w AS cum_n,
           SUM(tot) OVER w AS cum_s,
           SUM(n) OVER () AS all_n,
           SUM(tot) OVER () AS all_s
    FROM bins
    WINDOW w AS (ORDER BY bin)
)
SELECT ROUND(1.0 - SUM(
           (CAST(n AS DOUBLE) / all_n)
           * ((cum_s + cum_s - tot) / all_s)
       ), 6) AS gini,
       CAST(MAX(all_n) AS BIGINT) AS n_customers,
       ROUND(MAX(all_s), 2) AS total_spend
FROM lorenz
""",
    tags=("aggregate", "statistics", "concentration"),
)
def agg_gini_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-spend concentration from BINNED
    data: per-customer totals collapse into fixed-width spend bins,
    the Lorenz curve is swept over bins, and the trapezoid formula
    G = 1 - sum p_i (L_i + L_(i-1)) yields the grouped-data Gini —
    the standard concentration KPI ("do 20% of customers carry 80% of
    revenue?").

    Scale shape: the EXACT Gini needs a global sort of every customer
    by spend — the one thing to refuse at 100 TB. Binning first makes
    both windows run over <= (max_spend / bin_width) rows (~150 here),
    an aggregate-bounded frame in this repo's whitelisted class, while
    both aggregation stages stay map-side combinable. The binned value
    converges to the exact one from below as the width shrinks;
    width is the explicit precision/scale knob, and both engines
    compute the identical binned statistic so the check is hash-exact,
    not approximate-vs-exact."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    bins = spend.groupBy(
        F.floor(F.col("s") / GINI_BIN_WIDTH).cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("s").alias("tot"))
    w = Window.orderBy("bin")
    whole = Window.partitionBy()
    lorenz = bins.select(
        "n",
        "tot",
        F.sum("tot").over(w).alias("cum_s"),
        F.sum("n").over(whole).alias("all_n"),
        F.sum("tot").over(whole).alias("all_s"),
    )
    return lorenz.agg(
        F.round(
            1.0
            - F.sum(
                (F.col("n").cast("double") / F.col("all_n"))
                * ((F.col("cum_s") + F.col("cum_s") - F.col("tot")) / F.col("all_s"))
            ),
            6,
        ).alias("gini"),
        F.max("all_n").cast("bigint").alias("n_customers"),
        F.round(F.max("all_s"), 2).alias("total_spend"),
    )


@register(
    "agg_benford",
    oracle="""
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                AS INT) AS d
    FROM orders
    WHERE o_totalprice >= 1
),
counted AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(COUNT(*)) OVER () AS total
    FROM digits GROUP BY d
)
SELECT d AS first_digit, n,
       ROUND(CAST(n AS DOUBLE) / total, 6) AS observed,
       ROUND(log10(1.0 + 1.0 / d), 6) AS benford,
       ROUND(pow(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / d), 2)
             / log10(1.0 + 1.0 / d) * total, 4) AS chi2_term
FROM counted
ORDER BY first_digit
""",
    tags=("aggregate", "statistics", "benford"),
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screening of order totals: observed
    leading-digit frequencies vs the log10(1+1/d) expectation plus the
    per-digit chi-square contribution — the classic large-ledger fraud
    / synthetic-data smell test, run directly inside the engine.

    (This corpus is uniform-random, so it FAILS Benford loudly —
    demonstrably informative output, not a wall of matches.)

    Scale shape: digit extraction is a row-local string op on the
    integer part; one combinable 9-group count is the only shuffle,
    and the total comes from a window over those <= 9 aggregate rows
    (aggregate-bounded by the digit domain — the whitelisted class).
    At any corpus size this is one scan + one 9-row reduction."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counted = (
        orders.where(F.col("o_totalprice") >= 1)
        .groupBy(d.alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "d", "n", F.sum("n").over(Window.partitionBy()).alias("total")
        )
    )
    obs = F.col("n").cast("double") / F.col("total")
    exp = F.log10(1.0 + 1.0 / F.col("d"))
    return counted.select(
        F.col("d").alias("first_digit"),
        "n",
        F.round(obs, 6).alias("observed"),
        F.round(exp, 6).alias("benford"),
        F.round(F.pow(obs - exp, F.lit(2)) / exp * F.col("total"), 4).alias(
            "chi2_term"
        ),
    ).orderBy("first_digit")


KM_STUDY_END = "2001-03-31"  # right-censoring cutoff (study end)


@register(
    "agg_survival_km",
    oracle=f"""
WITH sp AS (
    SELECT l_orderkey,
           CAST(MIN(l_shipdate) AS DATE) AS s0,
           CAST(MAX(l_shipdate) AS DATE) AS s1
    FROM lineitem GROUP BY l_orderkey
),
obs AS (
    SELECT date_diff('day', s0,
                     CASE WHEN s1 <= DATE '{KM_STUDY_END}' THEN s1
                          ELSE DATE '{KM_STUDY_END}' END) AS dur,
           CASE WHEN s1 <= DATE '{KM_STUDY_END}' THEN 1 ELSE 0 END AS ev
    FROM sp WHERE s0 <= DATE '{KM_STUDY_END}'
),
per_dur AS (
    SELECT dur, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM obs GROUP BY dur
),
risk AS (
    SELECT dur, d,
           SUM(c) OVER () - COALESCE(SUM(c) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS at_risk
    FROM per_dur
),
km AS (
    SELECT dur, d, at_risk,
           SUM(CASE WHEN d < at_risk
                    THEN ln(1.0 - CAST(d AS DOUBLE) / at_risk) END)
               OVER (ORDER BY dur) AS log_s,
           MAX(CASE WHEN d = at_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY dur) AS hit_zero
    FROM risk
)
SELECT CAST(dur AS INT) AS duration_days,
       CAST(at_risk AS BIGINT) AS at_risk,
       d AS n_events,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE ROUND(exp(log_s), 6) END AS survival
FROM km
WHERE d > 0
ORDER BY duration_days
""",
    tags=("aggregate", "statistics", "survival"),
)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of order shipment-window length
    (days from an order's first to last shipment), RIGHT-CENSORED at
    the {KM_STUDY_END} study end: orders still shipping at the cutoff
    contribute person-time without an event — dropping them (the naive
    average) would bias the curve optimistic, which is exactly the
    mistake K-M exists to fix. Output: at-risk count, events, and
    S(t) at every event time.

    Scale shape: one combinable per-order min/max, one combinable
    per-duration count, then every K-M quantity — reverse cumulative
    at-risk, cumulative log-survival, and the absorbing S(t)=0 flag —
    comes from ordered windows over the DISTINCT-DURATION table,
    bounded by the calendar span, never the order count. The S(t)=0
    edge (a duration where every remaining subject fails) is handled
    with an explicit absorbing flag because ln(0) is NULL in Spark
    but -inf in DuckDB — the one engine divergence in this plan,
    fenced out rather than papered over."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit(KM_STUDY_END).cast("date")
    sp = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("s0"),
        F.max(F.to_date("l_shipdate")).alias("s1"),
    )
    obs = sp.where(F.col("s0") <= cutoff).select(
        F.datediff(F.least("s1", cutoff), F.col("s0")).alias("dur"),
        (F.col("s1") <= cutoff).cast("int").alias("ev"),
    )
    per_dur = obs.groupBy("dur").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("c")
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur")
    risk = per_dur.select(
        "dur",
        "d",
        (
            F.sum("c").over(w_all)
            - F.coalesce(F.sum("c").over(w_prev), F.lit(0))
        ).alias("at_risk"),
    )
    km = risk.select(
        "dur",
        "d",
        "at_risk",
        F.sum(
            F.when(
                F.col("d") < F.col("at_risk"),
                F.log(1.0 - F.col("d").cast("double") / F.col("at_risk")),
            )
        )
        .over(w_cum)
        .alias("log_s"),
        F.max((F.col("d") == F.col("at_risk")).cast("int"))
        .over(w_cum)
        .alias("hit_zero"),
    )
    return (
        km.where(F.col("d") > 0)
        .select(
            F.col("dur").cast("int").alias("duration_days"),
            F.col("at_risk").cast("bigint").alias("at_risk"),
            F.col("d").alias("n_events"),
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp("log_s"), 6))
            .alias("survival"),
        )
        .orderBy("duration_days")
    )
