"""Python-DataSource scan path (SURVEY.md §2B scans tier, round-6
post-window).

The scans tier covers every JVM-native format (parquet/ORC/CSV/JSONL/
XML/binaryFile/partitioned/DPP); this adds the remaining source
CLASS: a connector implemented in pure Python through Spark 4's
public DataSource API (sources/pyds.py) — how this engine would host
a SaaS-API or proprietary-format reader with split-parallel
executor-side parsing and no JVM code. The fixture is the derived
JSONL copy of nation (content-keyed cache), so the oracle simply
reads the logical table: any row the Python reader drops, dups, or
type-mangles breaks the hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register

PYDS_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
PYDS_REGION_MAX = 3


@register(
    "scan_python_datasource",
    oracle=f"""
SELECT n_nationkey, n_name, n_regionkey
FROM nation
WHERE n_regionkey < {PYDS_REGION_MAX}
ORDER BY n_nationkey
""",
    tags=("scan", "source", "python-datasource"),
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation read through the registered pure-Python `graft_jsonl`
    DataSource (Spark 4 DataSource API) with an explicit schema, then
    filtered and projected — proving the connector path end-to-end
    against the same logical table the parquet scan serves.

    Scale shape: `partitions()` exposes one split per part file, so a
    100 TB JSONL drop parallelizes across executors exactly like a
    native file source (each Python worker parses only its own file);
    the filter runs JVM-side after the Python rows land (predicate
    pushdown into a Python reader is possible via the API's filter
    pushdown hook but costs Python-side evaluation either way — for a
    columnar-capable backing store the native readers remain the fast
    path, which is why only the connector CLASS, not the parquet
    path, goes through Python)."""
    from target_iceberg_spark.plans.scans import _derived_nation_source
    from target_iceberg_spark.sources.pyds import JsonlDataSource

    path = _derived_nation_source(spark, sf_dir, "jsonl")
    spark.dataSource.register(JsonlDataSource)
    df = (
        spark.read.format("graft_jsonl")
        .schema(PYDS_SCHEMA)
        .option("path", path)
        .load()
    )
    return (
        df.where(F.col("n_regionkey") < PYDS_REGION_MAX)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )
