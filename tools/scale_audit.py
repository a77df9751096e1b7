#!/usr/bin/env python
"""Scale-growth audit: run the same queries isolated at two scale
factors and report warm-time ratios, flagging super-linear growth.

    python tools/make_scale_data.py            # once: builds .scaledata/sf1
    python tools/scale_audit.py q1,q2,... [--small DIR] [--big DIR] [--out F]

Runs `bench.py --only` in a FRESH JVM per scale factor (the isolated-
timing discipline — in-session medians can excurse several x under
JVM pressure), then emits one JSON artifact with per-query ratios.
A ratio above data_ratio (10x for sf0.1 -> sf1) is super-linear and
worth a plan read; see BENCH_SF1_r07.json for the annotated round-7
run (26/28 at or under linear; the two n-gram outliers are bounded by
their oracle-mirrored caps and inflated by the synthetic corpus's
tiny vocabulary).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, names: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    subprocess.run(
        [sys.executable, "bench.py", "--only", names],
        cwd=REPO,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(os.path.join(REPO, "BENCH_DETAIL_only.json")) as fh:
        return json.load(fh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", help="comma-separated registered query names")
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default=os.path.join(REPO, ".scaledata/sf1"))
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--data-ratio", type=float, default=10.0)
    ap.add_argument("--out", default="SCALE_AUDIT.json")
    args = ap.parse_args()

    small = run_bench(args.small, args.queries, args.cpus)
    big = run_bench(args.big, args.queries, args.cpus)
    ratios = {
        q: round(big["queries_warm"][q] / small["queries_warm"][q], 2)
        for q in small["queries_warm"]
    }
    out = {
        "small": {"dir": args.small, "warm": small["queries_warm"],
                  "total": small["total_warm_sec"]},
        "big": {"dir": args.big, "warm": big["queries_warm"],
                "total": big["total_warm_sec"]},
        "data_ratio": args.data_ratio,
        "warm_ratio": ratios,
        "total_ratio": round(big["total_warm_sec"] / small["total_warm_sec"], 2),
        "super_linear": sorted(
            (q for q, r in ratios.items() if r > args.data_ratio),
            key=lambda q: -ratios[q],
        ),
    }
    with open(os.path.join(REPO, args.out), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in ("total_ratio", "super_linear")}))


if __name__ == "__main__":
    main()
