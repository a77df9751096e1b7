"""Grid-blocked spatial radius join (SURVEY.md §2B joins tier,
round-6 post-window).

The reference engine has no geo support; this adds the join class a
100 TB pipeline with any location signal needs: find all pairs within
radius R WITHOUT the O(n*m) distance cross join, by snapping points to
an R-sized grid and equi-joining on the cell key — the standard
spatial blocking every distributed geo engine (e.g. Apache Sedona's
grid partitioner, public) is built on. Coordinates are md5-derived
uniforms so both engines materialize the IDENTICAL point set and the
whole join is hash-checkable; the same plan works unchanged on real
lat/lon columns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

GRID_R = 0.03  # join radius in the unit square; also the cell size

_HEX32 = 4294967296.0


def _coord_sql(prefix: str, key: str, j: int) -> str:
    """DuckDB: deterministic uniform in [0,1) from word j of
    md5(prefix || key)."""
    return (
        f"(CAST(concat('0x', substr(md5('{prefix}' || CAST({key} AS"
        f" VARCHAR)), {j * 8 + 1}, 8)) AS BIGINT) / {_HEX32})"
    )


def _coord_spark(prefix: str, key: str, j: int) -> F.Column:
    # NB: the divisor must be cast to DOUBLE explicitly — a bare
    # `/ 4294967296.0` literal parses as DECIMAL in Spark SQL, and
    # decimal propagation silently truncates the result scale to 6,
    # which hash-mismatches the oracle's full-precision doubles.
    return F.expr(
        f"cast(conv(substring(md5(concat('{prefix}', cast({key} as"
        f" string))), {j * 8 + 1}, 8), 16, 10) as bigint)"
        f" / cast({int(_HEX32)} as double)"
    )


@register(
    "join_spatial_grid",
    oracle=f"""
WITH cust AS (
    SELECT c_custkey,
           {_coord_sql("c", "c_custkey", 0)} AS x,
           {_coord_sql("c", "c_custkey", 1)} AS y
    FROM customer
),
supp AS (
    SELECT s_suppkey,
           {_coord_sql("s", "s_suppkey", 0)} AS x,
           {_coord_sql("s", "s_suppkey", 1)} AS y
    FROM supplier
),
cc AS (
    SELECT *, CAST(FLOOR(x / {GRID_R}) AS INT) AS cx,
              CAST(FLOOR(y / {GRID_R}) AS INT) AS cy
    FROM cust
),
sn AS (
    SELECT s.*, CAST(FLOOR(s.x / {GRID_R}) AS INT) + dx.dx AS cx,
                CAST(FLOOR(s.y / {GRID_R}) AS INT) + dy.dy AS cy
    FROM supp s
    CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
    CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
)
SELECT cc.c_custkey, sn.s_suppkey,
       (cc.x - sn.x) * (cc.x - sn.x) + (cc.y - sn.y) * (cc.y - sn.y)
           AS dist2
FROM cc JOIN sn ON cc.cx = sn.cx AND cc.cy = sn.cy
WHERE (cc.x - sn.x) * (cc.x - sn.x) + (cc.y - sn.y) * (cc.y - sn.y)
      <= {GRID_R} * {GRID_R}
ORDER BY c_custkey, s_suppkey
""",
    tags=("join", "spatial", "grid"),
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within radius {GRID_R} in the
    unit square, via grid blocking: each point snaps to an R-sized
    cell, the SMALLER side (suppliers) replicates to its 3x3 cell
    neighborhood, and ONE equi-join on the cell key produces the only
    candidates that can possibly be within R (cell size = R guarantees
    no miss), re-checked with the exact distance predicate. A customer
    lives in exactly one cell and each supplier copy in a distinct
    cell, so no pair can match twice — no pair-level DISTINCT, the same
    dedup-free discipline as join_interval_overlap.

    Scale shape: the naive form is an O(n*m) cross join with a
    distance filter — a BNLJ Spark would happily produce and the
    CI cartesian sweep forbids; this plan shuffles both sides once on
    compact int cell keys, the 9x replication lands on the small side
    only, and density skew (a hot cell) is AQE skew-join territory on
    an already-bounded candidate set. Coordinates are md5-word uniforms
    (exact dyadic rationals k/2^32, bit-identical in both engines), and
    dist2 is emitted RAW — same multiply/add tree in both engines, no
    rounding needed (the oracle-gotcha discipline for bit-identical
    doubles)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord_spark("c", "c_custkey", 0).alias("x"),
        _coord_spark("c", "c_custkey", 1).alias("y"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord_spark("s", "s_suppkey", 0).alias("x"),
        _coord_spark("s", "s_suppkey", 1).alias("y"),
    )
    cell = lambda c: F.floor(F.col(c) / GRID_R).cast("int")  # noqa: E731
    cc = cust.select(
        "c_custkey",
        F.col("x").alias("cx_x"),
        F.col("y").alias("cx_y"),
        cell("x").alias("cx"),
        cell("y").alias("cy"),
    )
    sn = (
        supp.select(
            "s_suppkey",
            F.col("x").alias("sx_x"),
            F.col("y").alias("sx_y"),
            cell("x").alias("scx"),
            cell("y").alias("scy"),
        )
        .select(
            "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx")
        )
        .select(
            "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy")
        )
        .select(
            "s_suppkey",
            "sx_x",
            "sx_y",
            (F.col("scx") + F.col("dx")).alias("cx"),
            (F.col("scy") + F.col("dy")).alias("cy"),
        )
    )
    ddx = F.col("cx_x") - F.col("sx_x")
    ddy = F.col("cx_y") - F.col("sx_y")
    dist2 = ddx * ddx + ddy * ddy
    return (
        cc.join(sn, ["cx", "cy"])
        .where(dist2 <= GRID_R * GRID_R)
        .select("c_custkey", "s_suppkey", dist2.alias("dist2"))
        .orderBy("c_custkey", "s_suppkey")
    )
