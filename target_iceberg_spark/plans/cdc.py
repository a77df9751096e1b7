"""Snapshot-diff / CDC audit (SURVEY.md §2B engine extension).

The lakehouse question the reference's append-only sink cannot answer:
WHAT changed between two table versions. One keyed full-outer join
classifies every row as inserted / deleted / updated / unchanged —
the audit a pipeline runs after every upsert/overwrite commit (the
batch analogue of reading an Iceberg changelog), and the verification
side of `writer.py`'s MERGE upsert and `streaming/`'s CDC-apply sink.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


def snapshot_diff(
    v1: DataFrame, v2: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Per-row change classification between two snapshot DataFrames:
    one full-outer equi-join on ``key``, change = any compared column
    null-safely differing. Scale shape: the join is a hash-partitioned
    SMJ on the key (co-partitionable / bucketable like any fact join);
    the per-row classification is a codegen CASE; nothing is collected.
    Column comparison is typed IS DISTINCT FROM per column — portable
    across engines, and at 100 TB you'd precompute a row-hash column
    at write time instead (same plan, one comparison)."""
    a = v1.select(
        F.col(key).alias("k1"),
        *[F.col(c).alias(f"a_{c}") for c in compare_cols],
    )
    b = v2.select(
        F.col(key).alias("k2"),
        *[F.col(c).alias(f"b_{c}") for c in compare_cols],
    )
    # keys-only diff (empty compare_cols) classifies matched keys as
    # unchanged — insert/delete detection without column comparison
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
    return a.join(b, F.col("k1") == F.col("k2"), "full_outer").select(
        F.coalesce("k1", "k2").alias(key),
        F.when(F.col("k2").isNull(), F.lit("deleted"))
        .when(F.col("k1").isNull(), F.lit("inserted"))
        .when(changed, F.lit("updated"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
WITH v2 AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 89 = 0
                THEN ROUND(o_totalprice * 1.1, 2) ELSE o_totalprice
           END AS o_totalprice,
           o_orderstatus
    FROM orders
    WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % 83 = 0
),
diff AS (
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'deleted'
                WHEN a.o_orderkey IS NULL THEN 'inserted'
                WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                  OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                THEN 'updated'
                ELSE 'unchanged'
           END AS change_type
    FROM orders a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
)
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n
FROM diff
GROUP BY change_type
ORDER BY change_type
""",
    tags=("cdc", "diff", "audit"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change summary between two snapshots of `orders`: snapshot v2 is
    derived deterministically from v1 (keys ÷97 deleted, prices ÷89
    bumped 10%, keys ÷83 re-inserted under shifted ids) so both
    engines diff the identical pair of tables; output is the 4-row
    (change_type, count) audit a CDC pipeline emits per commit.

    Scale shape: ONE full-outer equi-join on the key (sort-merge,
    co-locatable via bucketing — see join_bucketed), codegen CASE
    classification, combinable 4-group count. The price update keeps
    exact 2-decimal arithmetic (ROUND both sides) so 'updated' is a
    bit-stable class, not a float-noise class."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    v2 = (
        v1.where(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 89 == 0,
                F.round(F.col("o_totalprice") * 1.1, 2),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionAll(
            v1.where(F.col("o_orderkey") % 83 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    diff = snapshot_diff(v1, v2, "o_orderkey", ["o_totalprice", "o_orderstatus"])
    return (
        diff.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change_type")
    )
