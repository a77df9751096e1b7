"""End-to-end Iceberg-runtime smoke — jar-gated.

The container this engine is developed in ships NO iceberg-spark-
runtime jar, so the Iceberg branch of `writer.py` is normally covered
only by SQL-text tests (tests/test_iceberg_sql.py) and the parquet-
mode twin. This module is the real-runtime evidence the moment an
environment provides the jar (VERDICT.md round-4 item 5): drop
`iceberg-spark-runtime-*.jar` into pyspark's jars dir (or point
$SPARK_GRAFT_ICEBERG_JAR at it) and the full
create-namespace → append → MERGE upsert → DELETE round-trip runs
against a local Hadoop-type catalog (tmpdir warehouse — no REST
server needed; the REST+S3 conf path is covered by
test_catalog_conf.py). Reference behavior being replicated:
`/root/reference/target_iceberg/sinks.py:88-100` (load-or-create +
append), plus the upsert/delete extensions the reference lacks.
"""

from __future__ import annotations

import glob
import os

import pytest


def _iceberg_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.isfile(env):
        return env
    import pyspark

    candidates = glob.glob(
        os.path.join(
            os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar"
        )
    )
    return candidates[0] if candidates else None


_JAR = _iceberg_jar()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason="iceberg-spark-runtime jar not present (env-imposed; see module docstring)",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    """Own session (not the shared conftest one): Iceberg catalog conf
    must be set before JVM start, and the shared session has none."""
    from pyspark.sql import SparkSession

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-e2e")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.lakehouse", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.lakehouse.type", "hadoop")
        .config("spark.sql.catalog.lakehouse.warehouse", wh)
    )
    if _JAR and "pyspark/jars" not in _JAR:
        builder = builder.config("spark.jars", _JAR)
    spark = builder.getOrCreate()
    yield spark
    spark.stop()


def test_full_iceberg_round_trip(iceberg_spark, tmp_path):
    from target_iceberg_spark.writer import StreamWriter, WriterConfig

    spark = iceberg_spark
    cfg = WriterConfig(warehouse=str(tmp_path), namespace="smoke")
    w = StreamWriter(spark, cfg, mode="iceberg")
    assert w.mode == "iceberg"

    batch1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, v double"
    )
    w.upsert(batch1, "users", ["id"])  # creates the table
    ident = w.table_identifier("users")
    assert spark.table(ident).count() == 2

    # append path (reference sinks.py:100)
    w.append(
        spark.createDataFrame([(3, "c", 30.0)], "id long, name string, v double"),
        "users",
    )
    assert spark.table(ident).count() == 3

    # MERGE upsert: update id=1, insert id=4 — last-write-wins
    w.upsert(
        spark.createDataFrame(
            [(1, "a2", 11.0), (4, "d", 40.0)], "id long, name string, v double"
        ),
        "users",
        ["id"],
    )
    rows = {r["id"]: r for r in spark.table(ident).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["name"] == "a2" and rows[1]["v"] == 11.0

    # DELETE (ACTIVATE_VERSION retirement path)
    w.delete_where("users", "v >= 30.0")
    assert {r["id"] for r in spark.table(ident).collect()} == {1, 2}


def test_iceberg_schema_evolution_adds_column(iceberg_spark, tmp_path):
    from target_iceberg_spark.writer import StreamWriter, WriterConfig

    spark = iceberg_spark
    w = StreamWriter(
        spark, WriterConfig(warehouse=str(tmp_path), namespace="smoke2"),
        mode="iceberg",
    )
    w.upsert(
        spark.createDataFrame([(1, "x")], "id long, name string"), "t", ["id"]
    )
    # wider source batch: MERGE path must ALTER the target first
    # (closes reference sinks.py:92 TODO)
    w.upsert(
        spark.createDataFrame([(2, "y", 5.0)], "id long, name string, extra double"),
        "t",
        ["id"],
    )
    cols = set(spark.table(w.table_identifier("t")).columns)
    assert "extra" in cols
    rows = {r["id"]: r for r in spark.table(w.table_identifier("t")).collect()}
    assert rows[1]["extra"] is None and rows[2]["extra"] == 5.0
