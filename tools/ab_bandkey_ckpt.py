#!/usr/bin/env python
"""Same-JVM interleaved A/B of the §9 (r13) band-key localCheckpoint
inside operators/dedup.py::minhash_candidate_pairs, for ONE caller.

    python tools/ab_bandkey_ckpt.py dedup_ngram_jaccard [--sf DIR] [--reps 4]

Arm "off" monkeypatches minhash_candidate_pairs to the pre-r13 form
(no band-key checkpoint — the candidate self-join re-derives the
band-key table per side); arm "on" runs the code as written. Other
checkpoints in the query (e.g. the caller's shared shingle table)
stay ACTIVE in both arms, so this isolates exactly the §9 decision —
unlike tools/ab_ckpt.py, which no-ops every checkpoint. Dev tool only.
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
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from target_iceberg_spark.operators import dedup as dd
    from target_iceberg_spark.plans import dedup as plans_dd
    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.session import get_spark

    spark = get_spark("ab-bandkey-ckpt")
    specs = all_specs()
    real = dd.minhash_candidate_pairs

    def no_ckpt_variant(df, id_col, text_col, n=3, num_hashes=16, bands=4,
                        shingles=None):
        sh = shingles if shingles is not None else dd.shingle_table(
            df, id_col, text_col, n)
        sig = dd.minhash_signatures(sh, id_col, num_hashes)
        keys = dd.lsh_band_keys(sig, id_col, num_hashes, bands)  # no ckpt
        return dd.candidate_pairs(keys, id_col)

    def run(name: str) -> float:
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        specs[name].builder(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in args.queries:
        arms = {"off": [], "on": []}
        run(name)  # warmup
        for _ in range(args.reps):
            # plans/dedup.py binds the name at module import, so patch
            # BOTH the operator module and the plans module attribute.
            dd.minhash_candidate_pairs = no_ckpt_variant
            plans_dd.minhash_candidate_pairs = no_ckpt_variant
            try:
                arms["off"].append(run(name))
            finally:
                dd.minhash_candidate_pairs = real
                plans_dd.minhash_candidate_pairs = real
            arms["on"].append(run(name))
        print(
            f"{name}: "
            + "  ".join(
                f"{arm} min={min(v):.3f} all={[round(x, 3) for x in v]}"
                for arm, v in arms.items()
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
