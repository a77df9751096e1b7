#!/usr/bin/env python
"""Package a tools/scale_audit.py raw artifact into the round's
BENCH_SF1_r{N}.json shape (the format BENCH_SF1_r07.json introduced:
per-SF warm tables, totals, ratio annotations)."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("raw", help="scale_audit.py --out artifact")
    ap.add_argument("out", help="BENCH_SF1_r{N}.json path")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--what", required=True)
    ap.add_argument("--data-ratio", type=float, default=10.0)
    args = ap.parse_args()

    raw = json.load(open(args.raw))
    small = raw["small"]["warm"]
    big = raw["big"]["warm"]
    ratios = {
        q: round(big[q] / small[q], 2)
        for q in sorted(small)
        if small.get(q, 0) > 0 and q in big
    }
    over = {q: r for q, r in ratios.items() if r > args.data_ratio}
    out = {
        "round": args.round,
        "what": args.what,
        "cpus": raw.get("cpus", 32),
        "data_ratio": args.data_ratio,
        "sf0_1": {
            "total_warm_sec": round(sum(small.values()), 3),
            "queries_warm": {q: small[q] for q in sorted(small)},
        },
        "sf1": {
            "total_warm_sec": round(sum(big.values()), 3),
            "queries_warm": {q: big[q] for q in sorted(big)},
        },
        "warm_ratio_per_query": ratios,
        "total_ratio": round(
            sum(big.values()) / sum(small.values()), 2
        ),
        "super_linear": over,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
    print(
        f"{args.out}: total ratio {out['total_ratio']}x on "
        f"{args.data_ratio}x data; {len(over)} super-linear"
    )


if __name__ == "__main__":
    main()
