"""Recursive-CTE hierarchy walk (SURVEY.md §2B SQL-surface coverage,
round 7, post-window).

Spark 4 added ANSI `WITH RECURSIVE` (SPARK-24497) — the SQL feature
hierarchies, BOMs, and org charts were previously forced to hand-roll
as driver-side loops (the graph tier's pagerank/kcore do this with
explicit localCheckpoint rounds because their iteration counts are
data-dependent). This registers the declarative form: the engine runs
the fixpoint, one UNION ALL step per level, and the oracle side is
DuckDB's native recursive CTE over the identical synthetic hierarchy.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401  (parity of imports)
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "sql_recursive_hierarchy",
    oracle="""
WITH RECURSIVE tree(pk, root, depth) AS (
    SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
    UNION ALL
    SELECT p.p_partkey, t.root, t.depth + 1
    FROM part p JOIN tree t ON p.p_partkey // 10 = t.pk
    WHERE p.p_partkey >= 10
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
       CAST(MIN(pk) AS BIGINT) AS min_pk,
       CAST(MAX(pk) AS BIGINT) AS max_pk
FROM tree
GROUP BY depth
ORDER BY depth
""",
    tags=("sql", "recursive", "hierarchy"),
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-level rollup of a decimal-trie part hierarchy (parent =
    partkey div 10; contiguous TPC-H keys make every non-root's parent
    exist) computed with Spark 4's native WITH RECURSIVE — the
    declarative fixpoint the engine previously only offered as
    hand-rolled iteration. Depth is log₁₀(|part|), so the recursion
    runs ~4-5 UNION ALL steps at any realistic scale; each step is one
    equi-join of the previous frontier against the part scan (the
    frontier shrinks by 10× per level going up, grows going down —
    here seeded at the <10 roots and walking DOWN, so step i carries
    ~10^i rows and the final level dominates, same cost as one extra
    scan-join).

    The oracle is DuckDB's native recursive CTE over the identical
    SQL (integer-division operator spelled `div` vs `//` — the one
    dialect seam). Registered post-window; the driver row lands in
    round 8."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_rec_part")
    return spark.sql("""
WITH RECURSIVE tree(pk, root, depth) AS (
    SELECT p_partkey, p_partkey, 0 FROM _rec_part WHERE p_partkey < 10
    UNION ALL
    SELECT p.p_partkey, t.root, t.depth + 1
    FROM _rec_part p JOIN tree t ON p.p_partkey div 10 = t.pk
    WHERE p.p_partkey >= 10
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
       CAST(MIN(pk) AS BIGINT) AS min_pk,
       CAST(MAX(pk) AS BIGINT) AS max_pk
FROM tree
GROUP BY depth
ORDER BY depth
""")
