"""Local re-implementation of the driver's oracle check.

Runs a plan's Spark builder and its DuckDB oracle SQL over the same
parquet tables and compares row count, column names, and an
order-insensitive canonical form of every value. Strict by default:
floats must be bit-identical after the plan's own rounding — if they
are not, the driver's value hash can't be trusted to match either.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from target_iceberg_spark.sources.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "\\N"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    # datetime.date and everything else
    if v is pd.NaT:
        return "\\N"
    try:
        if pd.isna(v):  # scalar NA of any flavor
            return "\\N"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "isoformat"):
        iso = v.isoformat()
        # normalize date vs midnight-timestamp representations
        return iso if "T" in iso else iso + "T00:00:00"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows == d_rows:
        return
    diffs = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ][:5]
    raise AssertionError(
        f"{name}: {sum(a != b for a, b in zip(s_rows, d_rows))} of "
        f"{len(s_rows)} canonical rows differ; first diffs (spark vs duck): {diffs}"
    )


def check_query(spark, sf_dir: str, name: str, builder, oracle: str) -> None:
    spark_pdf = builder(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        duck_pdf = con.sql(oracle).df()
    finally:
        con.close()
    compare_frames(name, spark_pdf, duck_pdf)
