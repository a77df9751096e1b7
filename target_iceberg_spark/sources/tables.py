"""Loader for the engine's test/benchmark tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. Reads stay
fully declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown, column pruning and partition-sized splits for free; the only
massaging is the ``events.ts`` column, which is physically parquet
TIMESTAMP(NANOS) — a type Spark 4 refuses unless
``spark.sql.legacy.parquet.nanosAsLong=true``, in which case it surfaces
as a raw long of epoch-nanoseconds that we convert back to a
microsecond ``timestamp_ntz`` (matching what DuckDB reads, truncated).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame with engine-normalized columns."""
    from target_iceberg_spark.session import ensure_package_shipped

    # Every plan goes through here — guarantees executor Python workers
    # can import this package even under a foreign driver session.
    ensure_package_shipped(spark)
    if name == "events":
        # The nanos column needs the legacy read path; runtime-settable,
        # so this also works under a driver-owned session. Session-wide
        # by design (it is also in ENGINE_CONF): any OTHER nanos-typed
        # parquet column would then read as epoch-ns long and needs the
        # same explicit conversion this function applies to events.ts.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-ns long -> µs timestamp_ntz (truncating division, same as
        # DuckDB's TIMESTAMP_NS -> TIMESTAMP cast for post-1970 data).
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def register_temp_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so plans can use spark.sql()."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
