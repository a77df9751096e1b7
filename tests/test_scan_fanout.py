"""Round-13 scan fanout gate (sources/tables.py::scan_fanout).

The gate must (a) spread a single-split scan across defaultParallelism
when the table is too small for the split planner to feed every core,
(b) stay a no-op below the dimension floor and above the
cores x split-size ceiling (the provable at-scale no-op), and
(c) never change query results (repartition-invariance of the opted-in
aggregate/join plans is covered by tests/test_oracle_parity.py; here we
pin the row-identity of the fanned frame itself).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from target_iceberg_spark.sources import tables

SF = "/root/testdata/sf0.01"


def test_fanout_spreads_small_single_split_scan(spark):
    df = tables.load_table(spark, SF, "lineitem")
    assert df.rdd.getNumPartitions() == 1  # the fixture's single split
    fanned = tables.load_table(spark, SF, "lineitem", fanout=True)
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_fanout_noop_below_dimension_floor(spark):
    # sf0.01 documents (65 KB) is under the 256 KiB floor: same plan.
    plain = tables.load_table(spark, SF, "documents")
    fanned = tables.load_table(spark, SF, "documents", fanout=True)
    assert fanned.rdd.getNumPartitions() == plain.rdd.getNumPartitions()


def test_fanout_noop_at_scale_ceiling(spark, monkeypatch):
    # When on-disk bytes >= cores x split-size the planner already
    # feeds every core: the gate must not add an exchange.
    monkeypatch.setattr(tables, "_FANOUT_SPLIT_BYTES", 1)
    fanned = tables.load_table(spark, SF, "lineitem", fanout=True)
    assert fanned.rdd.getNumPartitions() == 1


def test_fanout_preserves_rows_exactly(spark):
    plain = tables.load_table(spark, SF, "lineitem")
    fanned = tables.load_table(spark, SF, "lineitem", fanout=True)
    assert fanned.count() == plain.count()
    # full-row multiset identity, not just count
    assert (
        fanned.select(F.md5(F.to_json(F.struct("*"))).alias("h"))
        .groupBy("h").count()
        .exceptAll(
            plain.select(F.md5(F.to_json(F.struct("*"))).alias("h"))
            .groupBy("h").count()
        )
        .count()
        == 0
    )


def test_fanout_keeps_filter_pushdown(spark):
    # Catalyst pushes predicates below the round-robin exchange, so
    # PushedFilters at the scan is unchanged by the gate.
    fanned = tables.load_table(spark, SF, "lineitem", fanout=True).filter(
        F.col("l_quantity") > 10
    )
    plan = fanned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity)" in plan
