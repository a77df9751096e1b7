"""Bound the HLL approximate-distinct estimate against exact counts."""

from __future__ import annotations

import pyspark.sql.functions as F

from target_iceberg_spark.plans import all_specs
from target_iceberg_spark.sources.tables import load_table


def test_approx_distinct_within_5pct(spark, sf_oracle):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in all_specs()["agg_approx_distinct"].builder(spark, sf_oracle).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)
