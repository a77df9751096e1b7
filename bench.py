#!/usr/bin/env python
"""Benchmark runner — executes every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "warm_total_sec": M, "queries_warm": {name: sec, ...}}

`value`/`queries` are COLD first-run times (include one-shot codegen
compile, which lands on queries essentially at random and adds ±15 s
of run-to-run noise at sf0.1); `warm_total_sec`/`queries_warm` are an
immediate second run of the same plan — steady-state execution cost,
the stable number for round-over-round comparison.

Each query is fully materialized through the `noop` sink (df.count()
would let Catalyst prune projections and under-measure).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from target_iceberg_spark.plans import all_specs
    from target_iceberg_spark.session import get_spark

    spark = get_spark("engine-bench")
    specs = all_specs()

    # JVM/codegen warmup on the flagship so query 1 isn't charged startup.
    specs["agg_group"].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    specs = {n: s for n, s in specs.items() if s.bench}
    for name, spec in sorted(specs.items()):
        try:
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
            # warm run: rebuilt plan, codegen/JIT already compiled
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a broken query must not kill the bench
            times.setdefault(name, -1.0)
            warm[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    warm_total = round(sum(t for t in warm.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "warm_total_sec": warm_total,
                "queries_warm": warm,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
