"""Shared co-purchase edge artifact for the graph tier.

Five graph queries (kcore, label propagation, modularity, link
prediction, triangles) analyze the SAME graph: part pairs bought
together in >= 2 orders. Deriving it is the single most expensive
stage of each — a distinct + self-equi-join + count over lineitem
(~1.5 s of every graph query's warm time at sf0.1) recomputed per
query. The production answer (documented since the tier landed) is to
materialize the edge list ONCE in the lakehouse and let every graph
workload scan it.

This module is that materialization, with the same cache discipline
as the IVF index and the derived source copies
(`plans/scans.py::_derived_source`): per-user cache root,
CONTENT-keyed on the lineitem parquet fingerprint (a regenerated
testdata set can never serve stale edges), atomic publish, stale-copy
sweep. The artifact stores UNthresholded pair counts (pa, pb, n) so
one artifact serves every support threshold; consumers filter
`n >= support`, which Spark pushes into the parquet scan.

At 100 TB the same artifact is an edges table in the warehouse,
incrementally maintained from new orders (pair counts are combinable,
so the refresh is an upsert of per-batch counts); every graph query
then starts from a scan instead of an O(Σ basket²) self-join.

`agg_copurchase` and `graph_triangles` intentionally keep their
inline derivation: both are driver-hash-green with plan-shape tests
pinning the self-join + AQE shuffle-reuse discipline — they document
HOW the artifact is built; this module is WHERE its consumers read it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def copurchase_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pa, pb, n) for every canonical (pa < pb) part pair sharing an
    order, n = number of shared orders — materialized once per
    lineitem content fingerprint, then a parquet scan."""
    from target_iceberg_spark.plans.scans import _derived_source

    def write(li: DataFrame, tmp: str) -> None:
        items = li.select("l_orderkey", "l_partkey").distinct()
        a, b = items.alias("a"), items.alias("b")
        (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("pa"),
                F.col("b.l_partkey").alias("pb"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .coalesce(4)
            .write.parquet(tmp)
        )

    src = _derived_source(spark, sf_dir, "lineitem", "copairs", write)
    return spark.read.parquet(src)


def copurchase_edges(
    spark: SparkSession, sf_dir: str, support: int
) -> DataFrame:
    """Support-thresholded edge list (pa, pb) from the cached pair
    counts; the `n >= support` filter pushes into the parquet scan."""
    return (
        copurchase_pair_counts(spark, sf_dir)
        .where(F.col("n") >= support)
        .select("pa", "pb")
    )
