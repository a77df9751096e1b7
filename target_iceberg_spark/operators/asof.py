"""As-of (point-in-time) join — no native Spark operator exists.

Implemented with the union + partitioned-window pattern:

  1. tag left (probe) and right (reference) rows and union them,
  2. one window partitioned by the join key, ordered by (ts, side) with
     reference rows sorting first at equal timestamps (inclusive match),
  3. ``last(value, ignorenulls=True)`` over an unbounded-preceding frame
     carries the most recent reference values forward onto probe rows,
  4. keep probe rows only.

Cost model at scale: exactly ONE shuffle (hash by key) + one sort within
partitions — the same cost as a sort-merge join, with no range-explosion.
All value columns are carried by the same "last reference row", so
multi-column results stay row-consistent. Skewed keys behave like any
skewed window: AQE does not split windows, so heavily skewed as-of keys
should be pre-salted by time-bucket if one key dominates.

DuckDB oracle equivalent: ``ASOF LEFT JOIN ... ON l.key = r.key AND
l.ts >= r.ts`` (verified in plans/joins.py::join_asof).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left as-of join: for each left row, attach ``value_cols`` from the
    latest right row with ``right_ts <= left_ts`` (strict ``<`` when
    ``allow_exact_matches=False``) and equal ``on`` key(s).

    ``left`` keeps all its columns; unmatched probes get NULL values.
    ``value_cols`` must not collide with ``left`` column names.
    """
    keys = [on] if isinstance(on, str) else list(on)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    value_cols = list(value_cols)

    # Reference rows sort before probe rows at equal ts for inclusive
    # semantics, after for exclusive.
    probe_rank = 1 if allow_exact_matches else 0
    ref_rank = 1 - probe_rank

    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(probe_rank).alias("_asof_side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(ref_rank).alias("_asof_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c) for c in value_cols],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tagged.unionByName(l_tagged)
    for c in value_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.where(F.col("_asof_side") == probe_rank).select(
        *keys, F.col("_asof_ts").alias(left_ts), *left_payload, *value_cols
    )
