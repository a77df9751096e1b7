#!/usr/bin/env python
"""Same-JVM interleaved A/B of the scan fanout gate.

    python tools/ab_fanout.py q1 q2 ... [--sf DIR] [--reps 3]

For each named query, alternates fanout-off / fanout-on executions
(noop sink, System.gc() before each, exactly the bench's timed form)
inside ONE JVM and reports the per-arm minimum — eliminating the
JVM-to-JVM variance that dominates back-to-back `bench.py --only`
comparisons.  Dev tool only.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.session import get_spark
    from target_iceberg_spark.sources import tables

    spark = get_spark("ab-fanout")
    specs = all_specs()
    real_min = tables._FANOUT_MIN_BYTES

    def run(name: str) -> float:
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        specs[name].builder(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # one untimed warmup per query per arm first (codegen steady state)
    results = {}
    for name in args.queries:
        arms = {"off": [], "on": []}
        for arm, gate in (("off", 1 << 60), ("on", real_min)):
            tables._FANOUT_MIN_BYTES = gate
            run(name)  # warmup
        for _ in range(args.reps):
            for arm, gate in (("off", 1 << 60), ("on", real_min)):
                tables._FANOUT_MIN_BYTES = gate
                arms[arm].append(run(name))
        tables._FANOUT_MIN_BYTES = real_min
        off, on = min(arms["off"]), min(arms["on"])
        results[name] = (off, on)
        print(
            f"{name}: off {off:.2f}s -> on {on:.2f}s ({on / off:.2f}x)  "
            f"raw off={[round(x, 2) for x in arms['off']]} "
            f"on={[round(x, 2) for x in arms['on']]}",
            flush=True,
        )
    t_off = sum(v[0] for v in results.values())
    t_on = sum(v[1] for v in results.values())
    print(f"TOTAL: off {t_off:.2f}s -> on {t_on:.2f}s ({t_on / t_off:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
