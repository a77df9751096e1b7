"""Shapley-value channel attribution (SURVEY.md §2B event-analytics
tier, round 11, post-window).

events_attribution hands conversion credit to single touchpoints
(first/last/linear); the game-theoretically fair split is the Shapley
value (Shapley 1953; standard in marketing-attribution literature —
public): each channel's credit is its average marginal contribution to
the conversion rate over all coalitions of the other channels,

    phi(c) = sum over S not containing c of
             |S|!(k-|S|-1)!/k! * (v(S + c) - v(S)).

Exact Shapley is exponential in channels — and k is the EVENT-TYPE
cardinality (4 here), a design constant, so the 2^k = 16 coalition
table is a plan literal at any corpus size. The characteristic
function v(S) = conversion rate among users whose pre-conversion
touched-set is contained in S, the standard "sub-coalition exposure"
estimator; conversion is TIME-BOXED (first purchase within
{SHAPLEY_WINDOW_DAYS} days of the user's first activity — the
attribution-lookback convention), because the fixture's raw ever-
purchased rate is ~100% and would collapse v to an indicator.

Scale shape: two corpus-sized combinable stages (per-user first
purchase, per-user touched bitmask via BIT_OR) joined once on
user_id; everything after runs on the <= 2^k-row mask table — the
coalition cross, the v(S) containment aggregate (mask & ~S = 0), and
the Shapley weighting are all literal-bounded. Factorial weights and
v(S) round to 6 in both engines; the efficiency property
sum(phi) = v(full) - v(empty) is emitted as a rounded gap column.
"""

from __future__ import annotations

from math import factorial

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SHAPLEY_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))
SHAPLEY_WINDOW_DAYS = 3  # conversion lookback from first activity
_K = len(SHAPLEY_CHANNELS)
_FULL = (1 << _K) - 1
# |S|!(k-|S|-1)!/k! for |S| = 0..k-1, as repr'd literals so both
# engines parse the identical double.
_W = tuple(
    repr(factorial(s) * factorial(_K - s - 1) / factorial(_K))
    for s in range(_K)
)


def _chan_case_sql() -> str:
    return (
        "CASE event_type "
        + " ".join(f"WHEN '{n}' THEN {b}" for n, b in SHAPLEY_CHANNELS)
        + " ELSE 0 END"
    )


def _weight_case_sql(var: str) -> str:
    return (
        f"CASE bit_count({var}) "
        + " ".join(f"WHEN {s} THEN {w}" for s, w in enumerate(_W))
        + " END"
    )


@register(
    "events_shapley_attribution",
    oracle=f"""
WITH fp AS (
    SELECT user_id, MIN(ts) AS first_ts,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
    FROM events GROUP BY user_id
),
touched AS (
    SELECT e.user_id,
           BIT_OR(CASE WHEN fp.p_ts IS NULL OR e.ts < fp.p_ts
                       THEN {_chan_case_sql()} ELSE 0 END) AS mask,
           MAX(CASE WHEN fp.p_ts IS NOT NULL
                     AND fp.p_ts <= fp.first_ts
                         + INTERVAL {SHAPLEY_WINDOW_DAYS} DAY
                    THEN 1 ELSE 0 END) AS conv
    FROM events e JOIN fp ON fp.user_id = e.user_id
    GROUP BY e.user_id
),
m AS (
    SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(conv) AS BIGINT) AS c
    FROM touched GROUP BY mask
),
subsets AS (SELECT unnest(range({_FULL} + 1)) AS s),
v AS (
    SELECT s,
           ROUND(COALESCE(SUM(m.c) / NULLIF(CAST(SUM(m.n) AS DOUBLE), 0), 0),
                 6) AS v
    FROM subsets LEFT JOIN m ON (m.mask & ~s) = 0
    GROUP BY s
),
chan(channel, b) AS (VALUES {", ".join(f"('{n}', {b})" for n, b in SHAPLEY_CHANNELS)}),
phi AS (
    SELECT ch.channel,
           ROUND(SUM({_weight_case_sql("vs.s")} * (vsb.v - vs.v)), 6)
               AS shapley
    FROM chan ch
    JOIN v vs ON (vs.s & ch.b) = 0
    JOIN v vsb ON vsb.s = (vs.s | ch.b)
    GROUP BY ch.channel
),
bounds AS (
    SELECT MAX(CASE WHEN s = 0 THEN v END) AS v_empty,
           MAX(CASE WHEN s = {_FULL} THEN v END) AS v_full
    FROM v
)
SELECT p.channel, p.shapley, b.v_empty, b.v_full,
       ROUND((SELECT SUM(shapley) FROM phi) - (b.v_full - b.v_empty), 4)
           AS efficiency_gap
FROM phi p CROSS JOIN bounds b
ORDER BY p.channel
""",
    tags=("events", "attribution", "shapley", "game-theory"),
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley conversion credit for the {_K} non-purchase
    channels: v(S) = conversion rate of users whose pre-first-purchase
    touched-set fits inside coalition S (conversion = first purchase
    within {SHAPLEY_WINDOW_DAYS} days of first activity — the lookback
    convention), phi = factorial-weighted
    marginal contributions over all 2^{_K} coalitions. The
    efficiency_gap column pins sum(phi) = v(full) - v(empty) to 0
    within rounding — the Shapley axiom the estimator must satisfy.

    Scale shape: two combinable per-user aggregates + one equi-join;
    every later stage is literal-bounded (16-row coalition table)."""
    ev = load_table(spark, sf_dir, "events")
    fp = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "p_ts"
        ),
    )
    chan_bit = F.lit(0)
    for name, bit in SHAPLEY_CHANNELS:
        chan_bit = F.when(F.col("event_type") == name, bit).otherwise(chan_bit)
    pre = F.col("p_ts").isNull() | (F.col("ts") < F.col("p_ts"))
    fast = F.col("p_ts").isNotNull() & (
        F.col("p_ts")
        <= F.col("first_ts") + F.expr(f"INTERVAL {SHAPLEY_WINDOW_DAYS} DAYS")
    )
    touched = (
        ev.join(fp, "user_id")
        .groupBy("user_id")
        .agg(
            F.bit_or(F.when(pre, chan_bit).otherwise(F.lit(0))).alias("mask"),
            F.max(F.when(fast, 1).otherwise(0)).alias("conv"),
        )
    )
    m = touched.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("c"),
    )
    subsets = spark.range(_FULL + 1).select(F.col("id").cast("int").alias("s"))
    v = (
        subsets.join(
            F.broadcast(m),
            m["mask"].bitwiseAND(F.col("s")) == m["mask"],
            "left",
        )
        .groupBy("s")
        .agg(
            F.round(
                F.coalesce(
                    F.sum("c")
                    / F.nullif(F.sum("n").cast("double"), F.lit(0.0)),
                    F.lit(0.0),
                ),
                6,
            ).alias("v")
        )
        # localCheckpoint: the 2^k-row coalition table is consumed four
        # times (vs/vsb join sides, bounds, total-via-phi); without the
        # cut each consumer re-ran the corpus-sized per-user aggregates
        # (round-13 plan audit: 20 scans / 82 exchanges in one plan).
        .localCheckpoint()
    )
    chan = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{n}', {b})" for n, b in SHAPLEY_CHANNELS)
        + " AS chan(channel, b)"
    )
    weight = F.lit(None).cast("double")
    vs_s = F.col("vs.s")
    for s_, w in enumerate(_W):
        weight = F.when(F.bit_count(vs_s) == s_, F.lit(float(w))).otherwise(
            weight
        )
    vs = v.alias("vs")
    vsb = v.select(F.col("s").alias("sb"), F.col("v").alias("vb")).alias("vsb")
    phi = (
        chan.join(F.broadcast(vs), vs_s.bitwiseAND(F.col("b")) == 0)
        .join(
            F.broadcast(vsb),
            F.col("sb") == vs_s.bitwiseOR(F.col("b")),
        )
        .groupBy("channel")
        .agg(
            F.round(F.sum(weight * (F.col("vb") - F.col("vs.v"))), 6).alias(
                "shapley"
            )
        )
    )
    bounds = v.agg(
        F.max(F.when(F.col("s") == 0, F.col("v"))).alias("v_empty"),
        F.max(F.when(F.col("s") == _FULL, F.col("v"))).alias("v_full"),
    )
    total = phi.agg(F.sum("shapley").alias("_tot"))
    return (
        phi.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(total))
        .select(
            "channel",
            "shapley",
            "v_empty",
            "v_full",
            F.round(
                F.col("_tot") - (F.col("v_full") - F.col("v_empty")), 4
            ).alias("efficiency_gap"),
        )
        .orderBy("channel")
    )
