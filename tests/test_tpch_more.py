"""Shape + equivalence pins for the Q1/Q2/Q4/Q6/Q9/Q11/Q12/Q16/Q20/
Q21/Q22 tier (plans/tpch_more.py). Value parity is covered by
tests/test_oracle_parity.py; these tests pin the 100 TB plan contract
and the one semantic rewrite that the oracle can't independently
witness (q21's EXISTS-fold, whose oracle uses the same folded form).
"""

from __future__ import annotations

import duckdb

from tests.test_plans import plan_of, pushed_filter_lists


def test_q1_single_scan_partial_agg(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q1_pricing_summary")
    assert plan.count("Scan parquet") == 1
    assert "partial_sum" in plan  # 8 aggregates combine map-side
    assert any("l_shipdate" in f for f in pushed_filter_lists(plan))


def test_q6_all_predicates_push_into_scan(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q6_revenue_forecast")
    filters = " ".join(pushed_filter_lists(plan))
    assert "l_shipdate" in filters
    assert "l_discount" in filters
    assert "l_quantity" in filters


def test_q4_exists_decorrelates_to_semi_join(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q4_order_priority")
    assert "LeftSemi" in plan
    assert any("o_orderdate" in f for f in pushed_filter_lists(plan))


def test_q16_not_in_plans_as_anti_join(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q16_supplier_variety")
    assert "LeftAnti" in plan
    assert any("p_size" in f for f in pushed_filter_lists(plan))


def test_q21_no_correlated_rescans(spark, sf_oracle):
    # both EXISTS quantifiers folded into aggregates: no semi/anti join
    # per quantifier, no BNLJ, bounded scan count
    plan = plan_of(spark, sf_oracle, "q21_waiting_supplier")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_max" in plan or "partial_sum" in plan


def test_q21_fold_matches_exists_form(spark, sf_oracle):
    """The q21 docstring's promise: the ns>1 / nl==1 aggregate fold is
    equivalent to the spec's EXISTS / NOT EXISTS phrasing. The oracle
    uses the folded SQL (so the driver checks the engine, not the
    rewrite); THIS test runs the EXISTS form in DuckDB and compares.
    numwait counts waiting ORDERS per supplier (COUNT DISTINCT
    orderkey in the EXISTS form): a supplier with several late lines
    in one order kept one order waiting, not several."""
    from target_iceberg_spark.plans import all_specs

    spark_rows = sorted(
        (r["s_name"], r["numwait"])
        for r in all_specs()["q21_waiting_supplier"].builder(spark, sf_oracle).collect()
    )
    con = duckdb.connect()
    for t in ("supplier", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_oracle}/{t}.parquet'"
        )
    from target_iceberg_spark.plans.tpch_more import Q21_LATE_DAYS

    exists_rows = sorted(
        (name, int(n))
        for name, n in con.execute(
            f"""
SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""
        ).fetchall()
    )
    con.close()
    assert spark_rows == exists_rows


def test_q2_correlated_min_keeps_all_min_cost_suppliers(spark, sf_oracle):
    """Every returned (part, supplier) pair carries that part's
    regional minimum cost, and every part in the result appears with
    ALL suppliers achieving the minimum (the correlated = MIN
    semantics, not an arbitrary argmin pick)."""
    from target_iceberg_spark.plans import all_specs

    rows = all_specs()["q2_min_cost_supplier"].builder(spark, sf_oracle).collect()
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], []).append(r)
    for pk, group in by_part.items():
        costs = {r["unit_cost"] for r in group}
        assert len(costs) == 1, f"part {pk}: non-minimal cost row leaked"
