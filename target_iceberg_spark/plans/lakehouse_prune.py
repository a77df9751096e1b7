"""Zone-map scan-pruning audit (SURVEY.md §2A maintenance extension,
round 11, post-window).

Iceberg/parquet scan planning skips whole files whose column min/max
("zone maps", manifest file stats in the Iceberg spec — public) are
disjoint from the predicate. Whether that works is a LAYOUT property:
a predicate on the clustered ingest key prunes almost everything, the
same-selectivity predicate on an uncorrelated column prunes nothing —
the reason sort orders / Z-ordering exist (and what
profile_zorder_clustering measures from the other direction).

This audit derives a deterministic file inventory (one file per
contiguous o_orderkey span — ingest order), computes each file's zone
maps for the clustered key and the uncorrelated o_totalprice, then
evaluates one range predicate per column: files skipped, scan
amplification (rows read per matching row), and zone-map
false-positive files (survived pruning, contain zero matches).

Scale shape: ONE combinable groupBy builds the per-file stats (min/
max/count plus both arms' conditional match counts in the same pass —
no second scan, no join), and each arm's summary is a bounded
aggregate over the metadata-sized file table. On a real catalog the
file-stat table comes straight from manifests and the data pass
disappears.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PRUNE_FILE_SPAN = 4_000  # orderkeys per simulated ingest file
PRUNE_KEY_LO, PRUNE_KEY_HI = 20_000, 26_000  # clustered-column range
PRUNE_PRICE_LO, PRUNE_PRICE_HI = 100_000.0, 130_000.0  # unclustered


def _arm_sql(arm: str, lo_col: str, hi_col: str, match_col: str, lo, hi) -> str:
    skip = f"({hi_col} < {lo} OR {lo_col} > {hi})"
    return f"""
    SELECT '{arm}' AS predicate_arm,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(COUNT(*) FILTER (WHERE {skip}) AS BIGINT) AS files_skipped,
           ROUND(COUNT(*) FILTER (WHERE {skip})
                 / CAST(COUNT(*) AS DOUBLE), 4) AS skip_rate,
           CAST(SUM(CASE WHEN {skip} THEN 0 ELSE n_rows END) AS BIGINT)
               AS rows_scanned,
           CAST(SUM({match_col}) AS BIGINT) AS rows_matching,
           ROUND(SUM(CASE WHEN {skip} THEN 0 ELSE n_rows END)
                 / CAST(GREATEST(SUM({match_col}), 1) AS DOUBLE), 4)
               AS scan_amplification,
           CAST(COUNT(*) FILTER (WHERE NOT {skip} AND {match_col} = 0)
                AS BIGINT) AS false_positive_files
    FROM files"""


@register(
    "lakehouse_scan_prune",
    oracle=f"""
WITH files AS (
    SELECT CAST(FLOOR(o_orderkey / {PRUNE_FILE_SPAN}) AS BIGINT) AS file_id,
           MIN(o_orderkey) AS key_min, MAX(o_orderkey) AS key_max,
           MIN(o_totalprice) AS price_min, MAX(o_totalprice) AS price_max,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE o_orderkey BETWEEN {PRUNE_KEY_LO}
                                 AND {PRUNE_KEY_HI}) AS BIGINT) AS m_key,
           CAST(COUNT(*) FILTER (WHERE o_totalprice BETWEEN {PRUNE_PRICE_LO!r}
                                 AND {PRUNE_PRICE_HI!r}) AS BIGINT) AS m_price
    FROM orders GROUP BY 1
)
SELECT * FROM (
    {_arm_sql("clustered_key", "key_min", "key_max", "m_key",
              PRUNE_KEY_LO, PRUNE_KEY_HI)}
    UNION ALL
    {_arm_sql("unclustered_price", "price_min", "price_max", "m_price",
              repr(PRUNE_PRICE_LO), repr(PRUNE_PRICE_HI))}
)
ORDER BY predicate_arm
""",
    tags=("lakehouse", "maintenance", "pruning", "layout"),
)
def lakehouse_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping audit over the simulated ingest layout (one file
    per {PRUNE_FILE_SPAN}-orderkey span): the clustered-key range
    predicate prunes almost every file, the equally-selective
    totalprice predicate prunes almost none — rows-scanned,
    amplification, and zone-map false positives quantify exactly what
    a sort-order change would buy.

    Scale shape: one combinable groupBy builds zone maps AND both
    arms' match counts in a single pass; each output row is a bounded
    aggregate over the metadata-sized file table. No joins, no
    windows."""
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.floor(F.col("o_orderkey") / PRUNE_FILE_SPAN)
        .cast("bigint")
        .alias("file_id")
    ).agg(
        F.min("o_orderkey").alias("key_min"),
        F.max("o_orderkey").alias("key_max"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(
            F.when(
                F.col("o_orderkey").between(PRUNE_KEY_LO, PRUNE_KEY_HI), 1
            )
        )
        .cast("bigint")
        .alias("m_key"),
        F.count(
            F.when(
                F.col("o_totalprice").between(PRUNE_PRICE_LO, PRUNE_PRICE_HI),
                1,
            )
        )
        .cast("bigint")
        .alias("m_price"),
    )

    def arm(name, lo_col, hi_col, match_col, lo, hi) -> DataFrame:
        skip = (F.col(hi_col) < lo) | (F.col(lo_col) > hi)
        scanned = F.sum(F.when(skip, 0).otherwise(F.col("n_rows")))
        matching = F.sum(match_col)
        return files.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.count(F.when(skip, 1)).cast("bigint").alias("files_skipped"),
            F.round(
                F.count(F.when(skip, 1)) / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("skip_rate"),
            scanned.cast("bigint").alias("rows_scanned"),
            matching.cast("bigint").alias("rows_matching"),
            F.round(
                scanned / F.greatest(matching, F.lit(1)).cast("double"), 4
            ).alias("scan_amplification"),
            F.count(F.when(~skip & (F.col(match_col) == 0), 1))
            .cast("bigint")
            .alias("false_positive_files"),
        ).select(F.lit(name).alias("predicate_arm"), "*")

    return (
        arm("clustered_key", "key_min", "key_max", "m_key",
            PRUNE_KEY_LO, PRUNE_KEY_HI)
        .unionAll(
            arm("unclustered_price", "price_min", "price_max", "m_price",
                PRUNE_PRICE_LO, PRUNE_PRICE_HI)
        )
        .orderBy("predicate_arm")
    )
