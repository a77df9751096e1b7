"""Bucketed band (range) join.

A time-band join `r.ts ∈ (l.ts + lower, l.ts + upper]` with only an
equi prefix on a low-cardinality key (e.g. 15 users) degenerates: each
join key's entire history lands on one task and the residual filter
does O(per-key^2) work. The standard fix buckets the timeline:

  1. right rows get bucket  b_r = floor(ts / width),
  2. each left row EXPLODES to the buckets its band can touch
     (floor((ts+lower)/width) .. floor((ts+upper)/width)),
  3. equi-join on (keys..., bucket) — fine-grained, skew-free —
  4. exact band residual filter.

With width ~ band size, each left row lands in ~2 buckets, and a task's
work is proportional to actual band occupancy, not key history length.
Same result set as the naive range join; the DuckDB oracle for
plans/joins.py::join_range is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def band_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Join left to right where
    ``right.right_ts > left.left_ts + lower_s`` and
    ``right.right_ts <= left.left_ts + upper_s`` with equal ``keys``.
    Returns left (aliased 'l') joined to right (aliased 'r'); callers
    select/aggregate from both sides.
    """
    if bucket_s is None:
        bucket_s = max(1, upper_s - lower_s)
    bucket_us = bucket_s * 1_000_000

    # All bucket arithmetic stays in integer microseconds: computing
    # buckets from double-precision epoch seconds can round a row that
    # sits exactly on a bucket boundary (e.g. r.ts == l.ts + upper_s)
    # into a bucket outside the left row's explored [lo, hi] range,
    # silently dropping a pair the exact residual filter would accept.
    def micros(col: Column) -> Column:
        return F.unix_micros(col.cast("timestamp"))

    def floor_div(a: Column, b: int) -> Column:
        # exact floor division on longs (plain `div`/cast truncate
        # toward zero, which differs for negative pre-epoch values);
        # (a - pmod) is exactly divisible, and the quotient is a small
        # bucket index, so the double division below is exact.
        return ((a - F.pmod(a, F.lit(b))) / F.lit(b)).cast("long")

    r = right.withColumn(
        "_band_bkt", floor_div(micros(F.col(right_ts)), bucket_us)
    ).alias("r")
    lo_bkt = floor_div(micros(F.col(left_ts)) + lower_s * 1_000_000, bucket_us)
    hi_bkt = floor_div(micros(F.col(left_ts)) + upper_s * 1_000_000, bucket_us)
    l = (
        left.withColumn("_band_bkt", F.explode(F.sequence(lo_bkt, hi_bkt)))
        .alias("l")
    )
    cond = F.col("l._band_bkt") == F.col("r._band_bkt")
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    residual = (
        F.col(f"r.{right_ts}")
        > F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower_s} SECOND")
    ) & (
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_s} SECOND")
    )
    return l.join(r, cond & residual)
