"""Guard-the-guard tests for the bounded-collect contract
(target_iceberg_spark/bounded.py, VERDICT r11 task 4): every driver
`.collect()` in the package routes through bounded_collect, the
structural prover rejects corpus-shaped plans, and the runtime cap
trips on a collect that outgrows its declared bound.
"""

from __future__ import annotations

import pathlib
import re

import pyspark.sql.functions as F
import pytest

from target_iceberg_spark.bounded import bounded_collect, unbounded_paths

PKG = pathlib.Path(__file__).resolve().parents[1] / "target_iceberg_spark"


def test_no_raw_collects_left_in_package():
    """Every .collect() in the package is either inside bounded.py or
    the df argument of a bounded_collect(...) call — no site can
    regress to a raw collect without failing this sweep."""
    offenders = []
    for path in PKG.rglob("*.py"):
        if path.name == "bounded.py":
            continue
        text = path.read_text()
        for m in re.finditer(r"\.collect\(\)", text):
            # a raw collect is one NOT preceded by a bounded_collect(
            # opener earlier in the same statement: approximate by
            # requiring 'bounded_collect(' within the preceding 600
            # chars with no intervening ')\n' statement terminator —
            # simpler and robust here: scan back to the enclosing
            # 'bounded_collect(' or statement start.
            start = text.rfind("bounded_collect(", 0, m.start())
            stmt = text.rfind("\n\n", 0, m.start())
            if start == -1 or start < stmt:
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.relative_to(PKG)}:{line}")
    assert not offenders, (
        f"raw .collect() outside bounded_collect: {offenders} — route "
        f"driver pulls through target_iceberg_spark.bounded.bounded_collect"
    )


def test_structural_prover_rejects_corpus_collect(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    # bare scan: rejected
    with pytest.raises(AssertionError, match="not structurally bounded"):
        bounded_collect(li, cap=10, why="test scan")
    # filter over a scan: still rejected (selectivity is not structure)
    with pytest.raises(AssertionError, match="not structurally bounded"):
        bounded_collect(
            li.where(F.col("l_orderkey") < 5), cap=10, why="test filter"
        )
    # join of bounded x unbounded: rejected
    with pytest.raises(AssertionError, match="not structurally bounded"):
        bounded_collect(
            li.join(li.limit(3).select("l_orderkey"), "l_orderkey"),
            cap=10,
            why="test join",
        )


def test_structural_prover_accepts_collapsed_plans(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert not unbounded_paths(agg)
    rows = bounded_collect(agg, cap=10, why="per-flag aggregate")
    assert 0 < len(rows) <= 10
    # limit-bounded and post-aggregate projections/sorts pass too
    assert not unbounded_paths(li.limit(7))
    assert not unbounded_paths(agg.orderBy("s").select("l_returnflag"))


def test_runtime_cap_trips_on_oversized_collect(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    # structural=False site whose declared bound is wrong: fail fast
    with pytest.raises(RuntimeError, match="exceed the declared cap"):
        bounded_collect(
            li.select("l_orderkey"),
            cap=5,
            why="test undersized cap",
            structural=False,
        )
    # an aggregate that outgrows its cap trips the same wire even
    # though the structural proof passes (the trusted-group-count
    # residual risk documented in bounded.py)
    agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    with pytest.raises(RuntimeError, match="exceed the declared cap"):
        bounded_collect(agg, cap=5, why="test corpus-keyed aggregate")


def test_prover_matches_window_prover_rule(spark, sf_oracle):
    """The package prover and the test-suite window prover encode the
    SAME boundedness rule — keep their verdicts aligned on the shared
    shapes so neither can drift silently."""
    from tests.test_plans import _subtree_is_bounded as test_rule

    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    shapes = [
        li,
        li.limit(4),
        li.groupBy("l_returnflag").count(),
        li.where(F.col("l_orderkey") < 9),
        spark.range(10),
        spark.range(10_000_000),
        li.join(li.limit(2).select("l_orderkey"), "l_orderkey"),
    ]
    for df in shapes:
        root = df._jdf.queryExecution().optimizedPlan()
        assert test_rule(root) == (not unbounded_paths(df))
