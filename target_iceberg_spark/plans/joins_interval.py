"""Interval-overlap self-join via coarse time-bin blocking
(SURVEY.md §2B joins tier, round-5 post-window).

Spark has no interval/overlap join operator: the naive formulation
(`a.s <= b.e AND b.s <= a.e`) plans a BroadcastNestedLoopJoin — a
scale-killer. The public technique (range/interval join optimization
in Databricks runtime docs and the IEJoin literature) is to EXPLODE
each interval onto the coarse grid cells it touches and equi-join on
(key, cell), turning O(n²) into a per-cell candidate join, then
re-check the exact predicate and dedup pairs that share multiple
cells. join_range applies the same idea to numeric bands; this is the
temporal version over genuinely two-sided interval sets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

TOP_SUPPLIERS = 20
BIN_DAYS = 7  # grid cell width; >= typical interval length (<= 15 d)


@register(
    "join_interval_overlap",
    oracle=f"""
WITH ivl AS (
    SELECT l_suppkey,
           l_orderkey * 8 + l_linenumber AS uid,
           CAST(l_shipdate AS DATE) AS s,
           CAST(l_shipdate AS DATE)
               + CAST(l_orderkey % 14 + 1 AS INTEGER) AS e
    FROM lineitem
)
SELECT a.l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_overlaps
FROM ivl a JOIN ivl b
  ON a.l_suppkey = b.l_suppkey AND a.uid < b.uid
 AND a.s <= b.e AND b.s <= a.e
GROUP BY a.l_suppkey
ORDER BY n_overlaps DESC, a.l_suppkey
LIMIT {TOP_SUPPLIERS}
""",
    tags=("join", "interval", "blocking"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count pairs of overlapping in-transit intervals per supplier
    (same deterministic transit spans as agg_max_concurrent), top
    {TOP_SUPPLIERS} suppliers. The oracle states the O(n²) inequality
    join; the Spark plan computes the SAME answer with bin blocking:

      1. each interval explodes onto the {BIN_DAYS}-day grid cells it
         touches (<= 3 cells for <= 15-day spans — bounded fanout,
         row-local, no shuffle),
      2. ONE shuffle equi-join on (supplier, cell) generates
         candidates — only intervals sharing a cell ever meet,
      3. the exact overlap predicate filters, and the FIRST-SHARED-
         CELL rule (emit a pair only in the cell where the later
         interval starts — a cell both sides of an overlapping pair
         provably touch) makes each pair appear exactly once WITHOUT
         a pair-level DISTINCT, saving a full shuffle of the pair set,
      4. a combinable count + TakeOrderedAndProject finish.

    At 100 TB the equi-join shuffles on (supplier, cell) — fine-
    grained, time-spread keys — where the naive plan is a nested loop
    over everything. Grid width is the one tunable: ~the p95 interval
    length balances fanout (wider = fewer copies) against candidate
    precision (narrower = fewer false candidates)."""
    li = load_table(spark, sf_dir, "lineitem", fanout=True)
    epoch = F.lit("1970-01-01").cast("date")
    s = F.to_date("l_shipdate")
    ivl = li.select(
        "l_suppkey",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("uid"),
        s.alias("s"),
        F.date_add(s, (F.col("l_orderkey") % 14 + 1).cast("int")).alias("e"),
    ).select(
        "*",
        F.floor(F.datediff(F.col("s"), epoch) / BIN_DAYS).alias("ws"),
        F.explode(
            F.sequence(
                F.floor(F.datediff(F.col("s"), epoch) / BIN_DAYS),
                F.floor(F.datediff(F.col("e"), epoch) / BIN_DAYS),
            )
        ).alias("cell"),
    )
    # NOT localCheckpoint'ed, deliberately (measured 3.2 -> 3.9 s
    # worse): the duplicate branch is only a cheap pruned parquet scan
    # + row-local date math fused into each join input's codegen
    # stage, while materializing the exploded frame pays
    # serialization and severs that fusion. Contrast
    # dedup_incremental, where the shared subtree is the EXPENSIVE
    # shingle->md5->minhash pipeline and checkpointing wins.
    a, b = ivl.alias("a"), ivl.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
        & (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.uid") < F.col("b.uid"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e"))
        # first-shared-cell: the cell holding max(s_a, s_b) is inside
        # BOTH intervals of an overlapping pair, so emitting only
        # there yields each pair exactly once — no DISTINCT needed
        & (F.col("a.cell") == F.greatest(F.col("a.ws"), F.col("b.ws"))),
    ).select(F.col("a.l_suppkey").alias("l_suppkey"))
    return (
        pairs.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
        .orderBy(F.desc("n_overlaps"), "l_suppkey")
        .limit(TOP_SUPPLIERS)
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH e AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
s AS (
    SELECT event_id AS signup_event_id, user_id, ts FROM events
    WHERE event_type = 'signup'
)
SELECT event_id, user_id, signup_event_id
FROM (
    SELECT e.event_id, e.user_id, s.signup_event_id,
           abs(epoch_us(e.ts) - epoch_us(s.ts)) AS dist,
           CASE WHEN s.ts <= e.ts THEN 0 ELSE 1 END AS fwd
    FROM e LEFT JOIN s USING (user_id)
)
QUALIFY row_number() OVER (
    PARTITION BY event_id ORDER BY dist, fwd, signup_event_id) = 1
ORDER BY event_id
""",
    tags=("join", "asof", "nearest"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each error event gets the CLOSEST
    same-user signup in absolute time, ties resolving backward
    (pandas.merge_asof semantics). The backward/forward direction
    variants of operators/asof.py get their driver-hash evidence here:
    the plan composes one backward and one forward single-shuffle
    union+window pass and picks the closer arm per probe — still zero
    range-explosion, vs the oracle's O(probes x signups-per-user)
    pairwise distance join.

    At 100 TB the two passes shuffle on user_id exactly like a
    sort-merge join each; the final closer-arm pick is a row-local
    CASE on the already-joined frame (no extra shuffle beyond the
    probe-identity rejoin documented in the operator)."""
    from target_iceberg_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    probes = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"), "user_id", "ts"
    )
    return (
        asof_join(
            probes,
            signups,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            value_cols=("signup_event_id",),
            direction="nearest",
        )
        .select("event_id", "user_id", "signup_event_id")
        .orderBy("event_id")
    )


@register(
    "join_scd2_pit",
    oracle="""
WITH o AS (
    SELECT user_id, event_id, ts, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events WHERE event_type <> 'purchase'
),
hist AS (
    SELECT user_id, ts AS valid_from, event_type
    FROM o WHERE prev_type IS NULL OR prev_type <> event_type
),
p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, h.event_type AS state_at,
       h.valid_from AS state_since
FROM p ASOF LEFT JOIN hist h
  ON p.user_id = h.user_id AND p.ts >= h.valid_from
ORDER BY p.event_id
""",
    tags=("join", "scd2", "point-in-time"),
)
def join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against an SCD2 dimension: every purchase
    event picks up the user's ACTIVITY STATE (the non-purchase
    event-type run, per events_scd2's interval construction) that was
    valid at purchase time — the "what was the entity's state at T"
    query that is the entire reason warehouses build SCD2 history.

    Scale shape: because SCD2 intervals TILE each entity's timeline,
    the interval predicate (valid_from <= t < valid_to) collapses to a
    backward as-of on valid_from — so the plan reuses
    operators/asof.py's single-shuffle union+window pass instead of a
    between-join with range residuals, and inherits its deterministic
    tie-breaks. The history build itself is the one-shuffle lag/filter
    reshape shared with events_scd2. The DuckDB oracle states the same
    collapse with its native ASOF JOIN."""
    from pyspark.sql import Window

    from target_iceberg_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    nonp = ev.where(F.col("event_type") != "purchase")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        nonp.select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.col("event_type").alias("state_at"),
            F.lag("event_type").over(order_w).alias("_prev"),
        )
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("state_at")))
        .select(
            "user_id",
            "valid_from",
            "state_at",
            F.col("valid_from").alias("state_since"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        asof_join(
            purchases,
            hist,
            on="user_id",
            left_ts="ts",
            right_ts="valid_from",
            value_cols=("state_at", "state_since"),
        )
        .select("event_id", "user_id", "state_at", "state_since")
        .orderBy("event_id")
    )
