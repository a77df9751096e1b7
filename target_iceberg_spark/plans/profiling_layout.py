"""Data-layout clustering audit: z-order vs single-key sort
(SURVEY.md §2B profiling tier, round-6 post-window).

At 100 TB the scan cost of a selective query is decided before it
runs, by LAYOUT: parquet/Iceberg file skipping prunes a file when the
predicate misses its min/max range, so the question "should this table
be z-ordered on (customer, date) or just date-sorted?" is answered by
how TIGHT each layout keeps per-file ranges in each dimension. This
query measures exactly that — the Morton/z-curve interleave (public;
the technique behind Delta/Iceberg Z-ORDER clustering) computed as
pure bit algebra, files modeled as range buckets on the layout key,
and the report is each layout's mean per-file range width per
dimension = the expected fraction of files a point predicate must
scan. Everything is integer bit arithmetic, bit-identical across
engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

Z_BITS = 16  # per-dimension resolution (z fits in 32 bits)
Z_FILE_BITS = 6  # 64 files per layout
_DOM = 1 << Z_BITS  # 65536


def _interleave_duck(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _interleave_spark(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


@register(
    "profile_zorder_clustering",
    oracle=f"""
WITH bounds AS (
    SELECT MIN(o_custkey) AS min_ck,
           MAX(o_custkey) AS max_ck,
           MIN(o_orderdate) AS min_d,
           MAX(o_orderdate) AS max_d
    FROM orders
),
norm AS (
    SELECT CAST(FLOOR((o_custkey - min_ck) * CAST({_DOM - 1} AS DOUBLE)
                      / (max_ck - min_ck)) AS BIGINT) AS x,
           CAST(FLOOR(date_diff('day', min_d, o_orderdate)
                      * CAST({_DOM - 1} AS DOUBLE)
                      / date_diff('day', min_d, max_d)) AS BIGINT) AS y
    FROM orders CROSS JOIN bounds
),
keyed AS (
    SELECT x, y, ({_interleave_duck("x", "y")}) AS z
    FROM norm
),
files AS (
    SELECT 'zorder' AS layout, z >> {2 * Z_BITS - Z_FILE_BITS} AS file_id,
           x, y
    FROM keyed
    UNION ALL
    SELECT 'bydate', y >> {Z_BITS - Z_FILE_BITS}, x, y FROM keyed
),
spans AS (
    SELECT layout, file_id,
           (MAX(x) - MIN(x) + 1) / CAST({_DOM} AS DOUBLE) AS ck_span,
           (MAX(y) - MIN(y) + 1) / CAST({_DOM} AS DOUBLE) AS date_span
    FROM files GROUP BY layout, file_id
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       ROUND(AVG(ck_span), 6) AS avg_custkey_span,
       ROUND(AVG(date_span), 6) AS avg_date_span
FROM spans
GROUP BY layout
ORDER BY layout
""",
    tags=("profiling", "layout", "zorder"),
)
def profile_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which layout should a 100 TB orders table ship in? Both
    candidate layouts are simulated in one scan: keys normalized to
    {Z_BITS}-bit grids, the Morton z-value bit-interleaved in pure
    integer algebra, and "files" modeled as the {1 << Z_FILE_BITS}
    range buckets a range-partitioned write of each layout key would
    produce (top {Z_FILE_BITS} bits — NO global sort or unpartitioned
    window, the scale-safe stand-in for a sorted write). Per file the
    min/max of each dimension gives the range width that min/max file
    skipping sees; the report is each layout's mean width per
    dimension = the expected fraction of files a point predicate
    scans. The z-order row showing BOTH dims tight (vs date-sort:
    date tight, customer ~full-width) is the measured case for
    Z-ORDER clustering, the audit a table-layout decision reads.

    Scale shape: one-row bounds aggregate broadcast-crossed; the
    normalize + interleave is a row-local integer projection inside
    codegen ({2 * Z_BITS} shift/mask terms); the double emission is a
    2x row-local fanout; per-(layout,file) min/max is ONE combinable
    aggregation over {2 << Z_FILE_BITS} groups folded to 2 rows. Max
    shift is {2 * Z_BITS - 1} < 63, overflow-safe as signed BIGINT in
    both engines (the profile_bloom_fpr lesson)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min("o_orderdate").alias("min_d"),
        F.max("o_orderdate").alias("max_d"),
    )
    norm = orders.crossJoin(F.broadcast(bounds)).select(
        F.floor(
            (F.col("o_custkey") - F.col("min_ck"))
            * float(_DOM - 1)
            / (F.col("max_ck") - F.col("min_ck"))
        )
        .cast("bigint")
        .alias("x"),
        F.floor(
            F.datediff(F.col("o_orderdate"), F.col("min_d"))
            * float(_DOM - 1)
            / F.datediff(F.col("max_d"), F.col("min_d"))
        )
        .cast("bigint")
        .alias("y"),
    )
    keyed = norm.select(
        "x", "y", F.expr(_interleave_spark("x", "y")).alias("z")
    )
    files = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"shiftright(z, {2 * Z_BITS - Z_FILE_BITS})").alias(
                        "file_id"
                    ),
                ),
                F.struct(
                    F.lit("bydate").alias("layout"),
                    F.expr(f"shiftright(y, {Z_BITS - Z_FILE_BITS})").alias(
                        "file_id"
                    ),
                ),
            )
        ).alias("lf"),
        "x",
        "y",
    ).select(F.col("lf.layout").alias("layout"), F.col("lf.file_id").alias("file_id"), "x", "y")
    spans = files.groupBy("layout", "file_id").agg(
        ((F.max("x") - F.min("x") + 1) / float(_DOM)).alias("ck_span"),
        ((F.max("y") - F.min("y") + 1) / float(_DOM)).alias("date_span"),
    )
    return (
        spans.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.round(F.avg("ck_span"), 6).alias("avg_custkey_span"),
            F.round(F.avg("date_span"), 6).alias("avg_date_span"),
        )
        .orderBy("layout")
    )
