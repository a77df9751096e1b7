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


def test_hll_rollup_merge_within_5pct(spark, sf_oracle):
    """The merged-daily-sketch estimate carries its own exact audit
    column; the merge across days must stay inside HLL's ±5%
    (lgConfigK=12 is ~1.6% standard error — 5% is >3 sigma)."""
    rows = all_specs()["agg_hll_rollup"].builder(spark, sf_oracle).collect()
    assert rows, "no event types"
    for r in rows:
        assert r["n_days"] > 1  # the merge path is actually exercised
        assert r["rel_err"] <= 0.05, (
            r["event_type"], r["est_users"], r["exact_users"])
