#!/usr/bin/env python
"""Emit plans/r13/<query>_{before,after}.txt explain("formatted") pairs.

    python tools/make_plan_pair.py q1 q2 ... [--sf DIR] [--out plans/r13] \
        [--arm both|before|after]

"before" renders the plan with the scan-fanout gate forced off (the
pre-round-13 plan shape for fanout-only changes); "after" renders the
current code as-is.  For optimizations that are not fanout-gated, run
with --arm before from the pre-change git checkout, then --arm after
from the post-change tree.  Dev tool only.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--arm", default="both", choices=["both", "before", "after"])
    args = ap.parse_args()

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.session import get_spark
    from target_iceberg_spark.sources import tables

    spark = get_spark("plan-pairs")
    specs = all_specs()
    os.makedirs(args.out, exist_ok=True)
    real_min = tables._FANOUT_MIN_BYTES
    arms = {"before": 1 << 60, "after": real_min}
    if args.arm != "both":
        arms = {args.arm: arms[args.arm]}
    for name in args.queries:
        for arm, gate in arms.items():
            tables._FANOUT_MIN_BYTES = gate
            df = specs[name].builder(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.out, f"{name}_{arm}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}")
    tables._FANOUT_MIN_BYTES = real_min
    return 0


if __name__ == "__main__":
    sys.exit(main())
