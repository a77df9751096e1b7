"""k-anonymity audit (SURVEY.md §2B curation north star, round 8).

Sweeney's k-anonymity (IJUFKS 2002, public): a release is k-anonymous
when every quasi-identifier (QI) combination matches at least k rows;
rows in smaller groups are re-identification risks. Training-data
curation runs this audit before shipping user-derived corpora —
companion to curation_pii_audit (which finds DIRECT identifiers;
this measures the joint-rarity risk that survives after they are
stripped) — and the standard mitigation is GENERALIZATION: coarsen a
QI column and re-measure. The query audits two rungs of that lattice
so the generalization payoff is part of the checked output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

KANON_KS = (2, 5, 10)


@register(
    "curation_kanonymity",
    oracle=f"""
WITH sizes AS (
    SELECT 0 AS level, CAST(COUNT(*) AS BIGINT) AS gsize
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS INT)
    UNION ALL
    SELECT 1 AS level, CAST(COUNT(*) AS BIGINT) AS gsize
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
),
ks AS (SELECT unnest(ARRAY{list(KANON_KS)}) AS k)
SELECT s.level, k.k,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (WHERE s.gsize < k.k) AS BIGINT)
           AS n_risky_groups,
       CAST(COALESCE(SUM(s.gsize) FILTER (WHERE s.gsize < k.k), 0)
            AS BIGINT) AS n_risky_rows,
       ROUND(CAST(COALESCE(SUM(s.gsize) FILTER (WHERE s.gsize < k.k), 0)
                  AS DOUBLE) / SUM(s.gsize), 4) AS risky_frac
FROM sizes s CROSS JOIN ks k
GROUP BY s.level, k.k
ORDER BY s.level, k.k
""",
    tags=("curation", "privacy", "k-anonymity"),
)
def curation_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk at two generalization levels: level 0 keeps
    the fine QI set (nation, segment, $1000 balance band), level 1
    generalizes the balance away. For k in {KANON_KS}, report how
    many QI groups fall under k and what fraction of ROWS sit in
    them — the re-identifiable population. The two levels make the
    generalization trade-off checkable: coarsening must weakly shrink
    risky_frac at every k (asserted in tests).

    Scale shape: one combinable groupBy per lattice rung (group sizes
    only — row payloads never shuffle), a union of the tiny size
    tables, a broadcast cross with the |K|-row k list, and a bounded
    final aggregate. At 100 TB the sizes tables are the only shuffle
    and they carry one bigint per occupied QI cell."""
    cust = load_table(spark, sf_dir, "customer")
    s0 = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("gsize")).select(
        F.lit(0).alias("level"), "gsize"
    )
    s1 = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("gsize")
    ).select(F.lit(1).alias("level"), "gsize")
    sizes = s0.unionAll(s1)
    ks = spark.createDataFrame([(k,) for k in KANON_KS], "k INT")
    risky = F.when(F.col("gsize") < F.col("k"), F.col("gsize"))
    return (
        sizes.crossJoin(F.broadcast(ks))
        .groupBy("level", "k")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.count(risky).alias("n_risky_groups"),
            F.coalesce(F.sum(risky), F.lit(0)).alias("n_risky_rows"),
            F.round(
                F.coalesce(F.sum(risky), F.lit(0)).cast("double")
                / F.sum("gsize"),
                4,
            ).alias("risky_frac"),
        )
        .orderBy("level", "k")
    )
