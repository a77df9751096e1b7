"""Bound the HLL approximate-distinct estimate against exact counts."""

from __future__ import annotations

import pyspark.sql.functions as F

from target_iceberg_spark.plans import all_specs
from target_iceberg_spark.sources.tables import load_table


def test_approx_distinct_within_5pct(spark, sf_oracle):
    """The query now folds the estimate to an audit boolean; the
    tighter observed 5% bound stays pinned here against the raw
    approx_count_distinct the plan uses."""
    rows = all_specs()["agg_approx_distinct"].builder(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r["users_within_rtol"] and r["values_within_rtol"]
    approx = {
        r["event_type"]: (r["au"], r["av"])
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("au"),
            F.approx_count_distinct("value", rsd=0.05).alias("av"),
        )
        .collect()
    }
    exact = {
        (r["event_type"]): (r["nu"], r["nv"])
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nu"),
            F.countDistinct("value").alias("nv"),
        )
        .collect()
    }
    for et, (nu, nv) in exact.items():
        au, av = approx[et]
        assert abs(au - nu) <= max(1, 0.05 * nu), (et, au, nu)
        assert abs(av - nv) <= max(1, 0.05 * nv), (et, av, nv)


def test_hll_rollup_merge_within_5pct(spark, sf_oracle):
    """The merged-daily-sketch estimate carries its own exact audit
    column; the merge across days must stay inside HLL's ±5%
    (lgConfigK=12 is ~1.6% standard error — 5% is >3 sigma)."""
    rows = all_specs()["agg_hll_rollup"].builder(spark, sf_oracle).collect()
    assert rows, "no event types"
    for r in rows:
        assert r["n_days"] > 1  # the merge path is actually exercised
        assert r["merge_within_rtol"]
    # the tighter 5% pin, straight from the sketch pipeline the plan
    # uses (the query folds it to the audit boolean the driver hashes)
    ev = load_table(spark, sf_oracle, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = {
        r["event_type"]: r["est"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(merged[et] - n) / n <= 0.05, (et, merged[et], n)
