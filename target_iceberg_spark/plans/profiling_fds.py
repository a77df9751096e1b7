"""Functional-dependency discovery probe (SURVEY.md §2B profiling
tier, round 9).

Whether column A determines column B is the backbone question of
schema normalization, candidate-key mining, and data-quality rules
(TANE, Huhtala et al. Comput. J. 1999, public — this is its
verification step over a fixed candidate set, the part that runs at
data scale). A violated "known" FD is how silently corrupted
dimension loads get caught, so profilers re-verify the candidate list
on every batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# (relation, determinant, dependent) candidates — a fixed audit list,
# mixing true FDs (key-driven and semantic) with expected violations.
FD_CANDIDATES = (
    ("customer", "c_nationkey", "c_mktsegment"),
    ("nation", "n_name", "n_regionkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),
    ("part", "p_brand", "p_type"),
    ("part", "p_name", "p_brand"),
)


def _fd_oracle() -> str:
    probes = "\nUNION ALL\n".join(
        f"""SELECT '{rel}' AS relation, '{det}' AS determinant,
       '{dep}' AS dependent,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT)
           AS n_violating_groups,
       CAST(MAX(nd) AS BIGINT) AS max_rhs_per_group,
       MAX(nd) = 1 AS fd_holds
FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd FROM {rel} GROUP BY 1)"""
        for rel, det, dep in FD_CANDIDATES
    )
    return f"""
{probes}
ORDER BY relation, determinant, dependent
"""


@register(
    "profile_functional_deps",
    oracle=_fd_oracle(),
    tags=("profiling", "quality", "dependencies"),
)
def profile_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verify {n} candidate functional dependencies A -> B: per
    candidate, the number of determinant groups, how many carry more
    than one dependent value (violations), the worst group's RHS
    cardinality, and the verdict. The audit list mixes key-driven
    FDs, one semantic FD, and expected violations so both verdict
    polarities are exercised.

    Scale shape: each candidate is ONE combinable two-phase aggregate
    (per-determinant distinct-dependent count, then a 4-value fold);
    candidates scan only their two columns (column pruning reaches the
    parquet scan) and the union glues {n} single-row frames. Nothing
    holds per-group state beyond a count, so the probe runs on any
    corpus the groupBy itself can shuffle.""".replace(
        "{n}", str(len(FD_CANDIDATES))
    )
    frames = []
    for rel, det, dep in FD_CANDIDATES:
        t = load_table(spark, sf_dir, rel)
        per = t.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        frames.append(
            per.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.max("nd").cast("bigint").alias("max_rhs_per_group"),
                (F.max("nd") == 1).alias("fd_holds"),
            ).select(
                F.lit(rel).alias("relation"),
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_groups",
                "n_violating_groups",
                "max_rhs_per_group",
                "fd_holds",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("relation", "determinant", "dependent")
