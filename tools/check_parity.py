"""Ad-hoc single-query parity check: python tools/check_parity.py name [name...]

Runs the registered builder and its DuckDB oracle at sf0.01 through the
same comparison tests/test_oracle_parity.py uses, without pytest
collection overhead. Dev tool only — CI runs the full parity suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from target_iceberg_spark.plans.registry import all_specs  # noqa: E402
from target_iceberg_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import check_query  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> int:
    names = sys.argv[1:]
    specs = all_specs()
    spark = get_spark(
        "parity-check",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    failed = []
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            if spec.oracle:
                check_query(spark, SF, name, spec.builder, spec.oracle)
                print(f"OK   {name} ({time.time() - t0:.1f}s)")
            else:
                n = spec.builder(spark, SF).count()
                print(f"ROWS {name}: {n} rows ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — dev tool, report and continue
            failed.append(name)
            print(f"FAIL {name}: {e}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
