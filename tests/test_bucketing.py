"""Bucketed-table co-located join: the zero-shuffle fact-fact join
story for 100 TB. Writing both tables bucketed+sorted on the join key
lets Spark sort-merge them with NO Exchange on either side — at scale
that removes the dominant cost of repeated fact joins."""

from __future__ import annotations

import pyspark.sql.functions as F

from target_iceberg_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    # session warehouse dir is a tmp dir (conftest static conf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    joined = (
        spark.table("b_orders")
        .hint("merge")  # pin SMJ (tiny test tables would broadcast)
        .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # bucketed sides sort-merge without exchanging rows
    join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    # and the result matches the unbucketed join
    want = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
