#!/usr/bin/env python
"""Same-JVM interleaved A/B of localCheckpoint placements.

    python tools/ab_ckpt.py q1 q2 ... [--sf DIR] [--reps 3]

Arm "off" monkeypatches DataFrame.localCheckpoint to identity (every
checkpoint in the query becomes a no-op, i.e. the pre-change lineage
re-execution); arm "on" runs the code as written.  Alternating noop-sink
executions in ONE JVM, min over reps — the ab_fanout.py methodology.
Only meaningful for queries whose SOLE checkpoints are the ones under
test (note others in OPTIMIZATION_r13.md when not).  Dev tool only.
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

    from pyspark.sql import DataFrame

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.session import get_spark

    spark = get_spark("ab-ckpt")
    specs = all_specs()
    real_ckpt = DataFrame.localCheckpoint

    def run(name: str) -> float:
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        specs[name].builder(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    results = {}
    for name in args.queries:
        arms = {"off": [], "on": []}
        for arm in ("off", "on"):  # one untimed warmup per arm
            DataFrame.localCheckpoint = (
                (lambda self, eager=True: self) if arm == "off" else real_ckpt
            )
            run(name)
        for _ in range(args.reps):
            for arm in ("off", "on"):
                DataFrame.localCheckpoint = (
                    (lambda self, eager=True: self) if arm == "off" else real_ckpt
                )
                arms[arm].append(run(name))
        DataFrame.localCheckpoint = real_ckpt
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
