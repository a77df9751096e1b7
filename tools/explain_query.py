#!/usr/bin/env python
"""Print a registered query's physical plan: the plan-audit loop.

    python tools/explain_query.py join_bloom_semi [more...] \
        [--sf /root/testdata/sf0.1] [--mode formatted|extended|cost]

Prints `.explain(mode)` for each named query plus the one-line scan
summary the CI asserts on (PushedFilters / ReadSchema occurrences,
Exchange & join operator counts, window specs) — the same signals
tests/test_plans.py sweeps, surfaced interactively while iterating
on a plan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )
    args = ap.parse_args()

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.session import get_spark

    spark = get_spark("explain")
    specs = all_specs()
    unknown = [q for q in args.queries if q not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    for name in args.queries:
        df = specs[name].builder(spark, args.sf)
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        df.explain(args.mode)
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {
            k: plan.count(k)
            for k in (
                "Exchange",
                "ReusedExchange",
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
                "Window",
                "HashAggregate",
                "Scan parquet",
                "WholeStageCodegen",
            )
        }
        print("-- operator counts:", {k: v for k, v in counts.items() if v})
    return 0


if __name__ == "__main__":
    sys.exit(main())
