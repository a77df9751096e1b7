"""Malformed-record quarantine on JSONL ingestion (SURVEY.md §2B
scan tier, round 10).

Production feeds are dirty: the ingestion surface must parse what it
can and QUARANTINE what it can't, without failing the job — Spark's
PERMISSIVE mode with columnNameOfCorruptRecord (the documented public
contract of the JSON source). This operator exercises that path
end-to-end: a derived nation JSONL copy with a DETERMINISTIC subset
of lines truncated mid-token (every n_nationkey % {CORRUPT_MOD} == 0),
read back with an explicit schema + corrupt-record column, and
summarized as clean/quarantined counts plus a checksum of the clean
rows.

The oracle never sees the corrupt file — it derives the SAME expected
stats from the logical nation table and the known corruption rule, so
the driver hash pins Spark's quarantine behavior against ground
truth: a parser that silently drops, double-counts, or "repairs" a
truncated line flips the hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.bounded import bounded_collect
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.scans import _derived_source

CORRUPT_MOD = 5  # rows with n_nationkey % MOD == 0 get truncated


def _derived_corrupt_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Single-file nation JSONL with deterministically truncated
    lines. Written driver-side from a bounded collect (nation is a
    25-row dim; the corruption rule needs byte-level control no
    DataFrame writer exposes)."""

    def write(df: DataFrame, tmp: str) -> None:
        import json
        import os

        rows = sorted(
            bounded_collect(
                df.select("n_nationkey", "n_name", "n_regionkey"),
                cap=32,
                why="nation is a fixed 25-row dimension at every SF",
                structural=False,
            ),
            key=lambda r: r["n_nationkey"],
        )  # bounded: 25-row dimension
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "part-00000.json"), "w") as fh:
            for r in rows:
                line = json.dumps(
                    {
                        "n_nationkey": r["n_nationkey"],
                        "n_name": r["n_name"],
                        "n_regionkey": r["n_regionkey"],
                    },
                    sort_keys=True,
                )
                if r["n_nationkey"] % CORRUPT_MOD == 0:
                    line = line[: len(line) // 2]  # truncate mid-token
                fh.write(line + "\n")

    return _derived_source(spark, sf_dir, "nation", "badjsonl", write)


@register(
    "scan_jsonl_corrupt",
    oracle=f"""
SELECT CAST(COUNT(*) FILTER (WHERE n_nationkey % {CORRUPT_MOD} != 0)
           AS BIGINT) AS n_clean,
       CAST(COUNT(*) FILTER (WHERE n_nationkey % {CORRUPT_MOD} = 0)
           AS BIGINT) AS n_quarantined,
       CAST(SUM(n_nationkey) FILTER (WHERE n_nationkey % {CORRUPT_MOD} != 0)
           AS BIGINT) AS clean_key_sum,
       ROUND(COUNT(*) FILTER (WHERE n_nationkey % {CORRUPT_MOD} = 0)
             / CAST(COUNT(*) AS DOUBLE), 4) AS quarantine_share
FROM nation
""",
    tags=("scan", "jsonl", "quality", "quarantine"),
    bench=False,
)
def scan_jsonl_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSONL ingestion with corrupt-record quarantine: the
    derived nation copy has every {CORRUPT_MOD}th key's line truncated;
    Spark reads it with an explicit schema + _corrupt_record column and
    reports clean count, quarantined count, the clean-row key checksum,
    and the quarantine share — hash-pinned against the logical table's
    ground truth, so silent drops or phantom repairs fail the driver.

    Scale shape: quarantine is a per-row parse decision inside the
    scan (no extra pass, no shuffle); the summary is one combinable
    aggregate. Excluded from bench (one-time file materialization).
    Reference contrast: the reference validates records against the
    Singer SCHEMA and aborts on mismatch (target.py); a 100 TB feed
    needs this quarantine-and-continue mode instead."""
    src = _derived_corrupt_jsonl(spark, sf_dir)
    schema = (
        "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, "
        "_corrupt_record STRING"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(src)
        .cache()  # Spark requires a materialization boundary between a
        # corrupt-record column and aggregates over it (documented JSON
        # source restriction); nation is a bounded dim, so this is a
        # 25-row cache, not a corpus pin
    )
    return raw.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("bigint")
        .alias("n_clean"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1))
        .cast("bigint")
        .alias("n_quarantined"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("n_nationkey")))
        .cast("bigint")
        .alias("clean_key_sum"),
        F.round(
            F.count(F.when(F.col("_corrupt_record").isNotNull(), 1))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("quarantine_share"),
    )
