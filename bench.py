#!/usr/bin/env python
"""Benchmark runner — executes every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

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
    specs = {n: s for n, s in specs.items() if s.bench}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        try:
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a broken query must not kill the bench
            times[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
