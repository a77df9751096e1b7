#!/usr/bin/env python
"""Same-JVM interleaved A/B of the pagerank round-fusion knob.

    python tools/ab_pagerank_fuse.py [--sf DIR] [--reps 4] [--fuse 2]

Arm "r1" runs graph_pagerank / graph_ppr with the default
rounds_per_checkpoint=1; arm "rN" monkeypatches the operator to the
fused cadence. Alternating noop-sink executions in ONE JVM, min over
reps — the ab_fanout.py methodology. Dev tool only.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--fuse", type=int, default=2)
    args = ap.parse_args()

    from target_iceberg_spark.operators import pagerank as pr_mod
    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.session import get_spark

    spark = get_spark("ab-pagerank-fuse")
    specs = all_specs()
    real = pr_mod.pagerank

    def run(name: str) -> float:
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        specs[name].builder(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in ("graph_pagerank", "graph_ppr"):
        arms = {"r1": [], f"r{args.fuse}": []}
        run(name)  # warmup (compile both shapes lazily below)
        for _ in range(args.reps):
            pr_mod.pagerank = real
            arms["r1"].append(run(name))
            pr_mod.pagerank = functools.partial(
                real, rounds_per_checkpoint=args.fuse
            )
            arms[f"r{args.fuse}"].append(run(name))
            pr_mod.pagerank = real
        print(
            f"{name}: "
            + "  ".join(
                f"{arm} min={min(v):.3f} all={[round(x,3) for x in v]}"
                for arm, v in arms.items()
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
