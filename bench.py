#!/usr/bin/env python
"""Benchmark runner — executes every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE SMALL JSON line (≤ ~200 bytes
so bounded tail-capture harnesses never truncate it):

  {"metric": "total_query_sec", "value": N, "unit": "sec", "sf": 0.1,
   "warm_total_sec": M, "n_queries": K, "detail": "BENCH_DETAIL.json"}

`value` is the COLD first-run total (includes one-shot codegen
compile, which lands on queries essentially at random and adds ±15 s
of run-to-run noise at sf0.1); `warm_total_sec` is the sum of
PER-QUERY MEDIANS over three immediate re-runs of every plan —
steady-state execution cost with single-run GC/JIT excursions voted
out (round 3 showed individual warm runs excursing 6x+ in a 114-query
single-JVM session; the median of 3 keeps each query within ~2x of
its isolated timing), the stable number for round-over-round
comparison.

Per-query cold/median/all-3-warm timings go to BENCH_DETAIL.json next
to this script (kept in-repo for round-over-round diffing), NOT to
stdout.

Each query is fully materialized through the `noop` sink (df.count()
would let Catalyst prune projections and under-measure).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from target_iceberg_spark.plans import all_specs
    from target_iceberg_spark.session import get_spark

    spark = get_spark("engine-bench")
    specs = all_specs()

    # Isolated-timing mode: `python bench.py --only q1,q2` benches ONLY
    # the named queries in this (fresh) JVM. Round-4 post-mortem showed
    # in-session warm medians excursing 6x over isolated cost after ~170
    # queries of JVM pressure; this flag separates plan regressions
    # (shows up isolated) from session noise (doesn't) without running
    # the full 100+-query sweep.
    only = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--only":
        only = sys.argv[2].split(",")
        missing = [n for n in only if n not in specs]
        if missing:
            sys.exit(f"bench: unknown queries {missing}")

    # JVM/codegen warmup on the flagship so query 1 isn't charged startup.
    specs["agg_group"].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    if only is not None:
        specs = {n: specs[n] for n in only}

    WARM_RUNS = 3  # median of 3 votes out one-off GC/JIT excursions

    times: dict[str, float] = {}
    warm_runs: dict[str, list[float]] = {}
    warm: dict[str, float] = {}
    specs = {n: s for n, s in specs.items() if s.bench}
    for name, spec in sorted(specs.items()):
        try:
            # Full JVM GC between queries (outside the timed window):
            # round 4 showed warm medians of unchanged plans excursing
            # 6x late in a 178-query single-JVM session while the same
            # plans ran at round-3 cost isolated (--only). Forcing
            # collection here keeps one query's garbage from being
            # charged to the next query's timing.
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
            # warm runs: rebuilt plan each time, codegen/JIT compiled
            runs = []
            for _ in range(WARM_RUNS):
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
            warm_runs[name] = runs
            warm[name] = statistics.median(runs)
        except Exception as exc:  # a broken query must not kill the bench
            times.setdefault(name, -1.0)
            warm_runs.setdefault(name, [])
            warm[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    warm_total = round(sum(t for t in warm.values() if t >= 0), 3)
    failed = sorted(n for n, t in warm.items() if t < 0)

    # Per-query detail goes to a side file (and stderr) — NOT the stdout
    # JSON line, which bounded tail-capture harnesses would truncate.
    # Isolated --only runs write a SEPARATE file so a spot-check never
    # clobbers the last full-sweep detail kept in-repo for round diffs.
    detail_name = "BENCH_DETAIL.json" if only is None else "BENCH_DETAIL_only.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               detail_name)
    detail = {
        "sf": sf,
        "total_cold_sec": total,
        "total_warm_sec": warm_total,
        "warm_runs_per_query": WARM_RUNS,
        "queries_cold": times,
        "queries_warm": warm,  # per-query median of warm_runs
        "queries_warm_runs": warm_runs,
    }
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(f"bench: per-query detail written to {detail_path}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "warm_total_sec": warm_total,
                "n_queries": len(times),
                "n_failed": len(failed),
                "detail": detail_name,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
