"""Round-8 operator tests: NDV-derived Bloom sizing, bench sweep
mechanics, and the round-8 query additions."""

from __future__ import annotations

import pyspark.sql.functions as F

from target_iceberg_spark.plans.registry import all_specs

SPECS = all_specs()


def _plan(spark, sf, name):
    df = SPECS[name].builder(spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_sized_m_properties():
    """sized_m must (a) be a power of two, (b) give >= 8 bits/key
    inside the clamp range so the k=4 load factor kn/m <= 0.5 and
    FPR <= (1-e^-0.5)^4 ~ 2.4%, (c) clamp to [2^13, 2^22]."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from target_iceberg_spark.plans.joins_bloom import (
        BLOOM_K,
        BLOOM_M_MAX,
        BLOOM_M_MIN,
        sized_m,
    )

    @given(st.integers(min_value=0, max_value=10**9))
    @settings(max_examples=300, deadline=None)
    def check(n):
        m = sized_m(n)
        assert m & (m - 1) == 0  # power of two
        assert BLOOM_M_MIN <= m <= BLOOM_M_MAX
        if 8 * max(n, 1) <= BLOOM_M_MAX:
            assert m >= 8 * max(n, 1)
            fpr = (1 - math.exp(-BLOOM_K * max(n, 1) / m)) ** BLOOM_K
            assert fpr <= (1 - math.exp(-0.5)) ** BLOOM_K + 1e-12

    check()


def test_bloom_filters_use_ndv_derived_size(spark, sf_oracle):
    """Both bloom queries must size their literal from the build
    side's NDV: the memoized (m, words) pair carries a power-of-two m
    with len(words) == m/32, and the two queries stay hash-identical
    to their plain-join oracles (covered by test_oracle_parity — here
    we assert the PARAMETERIZATION took effect, i.e. m follows the
    key count, not a pinned constant)."""
    from target_iceberg_spark.plans import dedup_bloom, joins_bloom
    from target_iceberg_spark.sources.tables import load_table

    # force both builds
    SPECS["join_bloom_semi"].builder(spark, sf_oracle).collect()
    SPECS["dedup_bloom_incremental"].builder(spark, sf_oracle).collect()

    (m1, w1) = next(iter(joins_bloom._WORDS_MEMO.values()))
    (m2, w2) = next(iter(dedup_bloom._HIST_MEMO.values()))
    for m, w in ((m1, w1), (m2, w2)):
        assert m & (m - 1) == 0
        assert len(w) == m // 32

    cust = load_table(spark, sf_oracle, "customer")
    n_seg = cust.where(F.col("c_mktsegment") == joins_bloom.SEGMENT).count()
    # approx NDV is within a few % of exact; sized_m rounds to the
    # next power of two, so the derived m is within one doubling of
    # the exact-count sizing
    want = joins_bloom.sized_m(n_seg)
    assert want // 2 <= m1 <= want * 2


def test_winnowing_zipf_valve_active_and_no_window(spark, sf_oracle):
    """The Zipf twin exists to exercise the boilerplate DF cap: the
    killed band must be NON-EMPTY (the uniform-corpus original never
    populates it) and the pair count must survive. Plan: the entire
    fingerprint derivation is array expressions over checkpointed
    stages — no per-doc WindowExec, no cartesian."""
    plan = _plan(spark, sf_oracle, "text_winnowing_zipf")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" not in plan
    row = SPECS["text_winnowing_zipf"].builder(spark, sf_oracle).collect()[0]
    assert row["n_killed"] > 0
    assert 0 < row["kill_rate"] < 1
    assert row["n_pairs"] > 0
    assert row["n_shared_hashes"] > row["n_killed"]


def test_dup_ngram_zipf_valve_active(spark, sf_oracle):
    """Boilerplate ceiling active: killed grams > 0, and the two
    fraction bands are disjoint (dup_frac counts only 2..cap)."""
    rows = SPECS["text_dup_ngram_zipf"].builder(spark, sf_oracle).collect()
    assert rows
    assert all(r["n_boiler_grams"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["avg_dup_frac"] <= 1
        assert 0 <= r["avg_boiler_frac"] <= 1
        assert r["avg_dup_frac"] + r["avg_boiler_frac"] <= 1
