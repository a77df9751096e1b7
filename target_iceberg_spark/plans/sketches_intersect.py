"""HLL set-intersection estimation via inclusion-exclusion
(SURVEY.md §2B sketch tier, round 10).

agg_hll_rollup merges sketches UP (unions re-aggregate losslessly);
the other set operation product analytics asks for — audience
OVERLAP ("how many users did both X and Y?") — has no direct sketch:
HLLs only union. The standard answer (Datasketches' own docs;
Flajolet et al. 2007 lineage, public) is inclusion-exclusion on three
union-able estimates: |A∩B| ≈ |A| + |B| − |A∪B|, with relative error
amplified by |A∪B|/|A∩B| — which is why the audit row carries the
exact intersection beside the estimate and pins the error contract
at this overlap ratio.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

HLL_IX_A = "click"  # audience A: users with this event type
HLL_IX_B = "view"  # audience B: users with this one (heavy overlap)
# lgK=12 rsd ~1.6% per estimate; I-E stacks three, and the fixture's
# union/intersection ratio ~1.3 amplifies it — 15% is the honest bound
HLL_IX_RTOL = 0.15


@register(
    "agg_hll_intersection",
    oracle=f"""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = '{HLL_IX_A}'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = '{HLL_IX_B}')
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS exact_a,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS exact_b,
       CAST((SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS BIGINT)
           AS exact_both,
       TRUE AS union_within_rtol,
       TRUE AS intersection_within_rtol
""",
    tags=("agg", "approx", "sketch", "audit"),
)
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimate from three HLL sketches: |A|, |B|,
    and |A∪B| (one union merge), intersection by inclusion-exclusion,
    hash-checked as within-{HLL_IX_RTOL} booleans beside the
    SQL-exact audience sizes and true overlap.

    Scale shape: both audience sketches AND their union build in ONE
    combinable pass over events (sketches ship per-partition, never
    user ids — ~2.5 KiB each at lgK=12); the exact arm (distinct
    users + a distinct-distinct join) is the audit luxury that dies
    first at 100 TB, kept because it is what makes the error contract
    hash-checkable. The I-E estimate itself costs three sketch reads
    whatever the corpus size."""
    ev = load_table(spark, sf_dir, "events")
    ab = ev.where(F.col("event_type").isin(HLL_IX_A, HLL_IX_B))
    sk = ab.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.when(F.col("event_type") == HLL_IX_A, F.col("user_id")))
        ).alias("est_a"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.when(F.col("event_type") == HLL_IX_B, F.col("user_id")))
        ).alias("est_b"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_union"),
    )
    a = ab.where(F.col("event_type") == HLL_IX_A).select("user_id").distinct()
    b = ab.where(F.col("event_type") == HLL_IX_B).select("user_id").distinct()
    exact = (
        a.agg(F.count(F.lit(1)).cast("bigint").alias("exact_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).cast("bigint").alias("exact_b")))
        .crossJoin(
            a.join(b, "user_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("exact_both")
            )
        )
    )
    est_both = F.col("est_a") + F.col("est_b") - F.col("est_union")
    exact_union = F.col("exact_a") + F.col("exact_b") - F.col("exact_both")
    return exact.crossJoin(F.broadcast(sk)).select(
        "exact_a",
        "exact_b",
        "exact_both",
        (
            F.abs(F.col("est_union") - exact_union) / exact_union <= HLL_IX_RTOL
        ).alias("union_within_rtol"),
        (
            F.abs(est_both - F.col("exact_both")) / F.col("exact_both")
            <= HLL_IX_RTOL
        ).alias("intersection_within_rtol"),
    )
