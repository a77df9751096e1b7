#!/usr/bin/env python
"""Per-stage profile of a registered query: run it (noop sink), then
dump every stage's duration, task count, and shuffle bytes from the
Spark UI REST API — the CLI stand-in for the UI's Stages tab
(optimization guide §1.1 / §7.1).

    python tools/profile_query.py q [--sf DIR] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.session import get_spark

    spark = get_spark("profile")
    specs = all_specs()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages() -> list[dict]:
        url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url) as resp:
            return json.load(resp)

    # warmup (codegen steady state)
    for _ in range(args.reps):
        specs[args.query].builder(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()

    before_ids = {(s["stageId"], s["attemptId"]) for s in stages()}

    spark._jvm.System.gc()
    t0 = time.perf_counter()
    df = specs[args.query].builder(spark, args.sf)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    print(f"build {t1 - t0:.3f}s  exec {t2 - t1:.3f}s  total {t2 - t0:.3f}s")

    def ms(s: dict, key: str) -> float:
        return s.get(key, 0) / 1000.0

    rows = []
    for s in stages():
        if (s["stageId"], s["attemptId"]) in before_ids:
            continue
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        com = s.get("completionTime")
        dur = -1.0
        if sub and com:
            fmt = "%Y-%m-%dT%H:%M:%S.%f"
            dur = time.mktime(
                time.strptime(com[:-3], fmt)
            ) + float(com[20:-3] or 0) * 0 - time.mktime(
                time.strptime(sub[:-3], fmt)
            )
            dur += (int(com[20:23]) - int(sub[20:23])) / 1000.0
        rows.append(
            (
                dur,
                s["stageId"],
                s["numCompleteTasks"],
                ms(s, "executorRunTime"),
                ms(s, "executorDeserializeTime"),
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                s["name"].split("\n")[0][:60],
            )
        )
    rows.sort(reverse=True)
    print(
        f"{'wall_s':>7} {'stage':>5} {'tasks':>5} {'cpu_s':>7} {'deser':>6} "
        f"{'shufR':>9} {'shufW':>9}  name"
    )
    for dur, sid, nt, cpu, des, sr, sw, name in rows:
        print(
            f"{dur:7.3f} {sid:5d} {nt:5d} {cpu:7.2f} {des:6.2f} "
            f"{sr:9d} {sw:9d}  {name}"
        )
    print(
        f"stage wall sum {sum(r[0] for r in rows if r[0] > 0):.2f}s "
        f"over {len(rows)} stages"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
