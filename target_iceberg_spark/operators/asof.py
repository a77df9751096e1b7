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
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    allow_exact_matches: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each left row, attach ``value_cols`` from the
    nearest right row in ``direction`` with an equal ``on`` key:

      - ``backward`` (default): latest right row with right_ts <= left_ts
      - ``forward``: earliest right row with right_ts >= left_ts
      - ``nearest``: whichever of the two is closer in absolute time
        (ties resolve backward, matching pandas.merge_asof). Implemented
        as a backward pass + a forward pass joined on the probe identity
        (keys + ts + payload), which must therefore be unique per row.

    ``allow_exact_matches=False`` makes the comparisons strict.
    ``left`` keeps all its columns; unmatched probes get NULL values.
    ``value_cols`` must not collide with ``left`` column names.
    """
    if direction == "nearest":
        keys = [on] if isinstance(on, str) else list(on)

        def _pass(tag: str, d: str) -> DataFrame:
            renamed = right.select(
                *[F.col(k) for k in keys],
                F.col(right_ts),
                F.col(right_ts).alias(f"_{tag}_ts"),
                *[F.col(c).alias(f"_{tag}_{c}") for c in value_cols],
            )
            return asof_join(
                left,
                renamed,
                on,
                left_ts,
                right_ts,
                [f"_{tag}_ts", *[f"_{tag}_{c}" for c in value_cols]],
                allow_exact_matches,
                direction=d,
            )

        join_cols = keys + [left_ts] + [
            c for c in left.columns if c not in keys and c != left_ts
        ]
        bwd, fwd = _pass("bwd", "backward").alias("b"), _pass("fwd", "forward").alias("f")
        # null-safe equality on the probe identity — plain `on=join_cols`
        # would drop probe rows carrying NULL payload values
        cond = None
        for c in join_cols:
            eq = F.col(f"b.{c}").eqNullSafe(F.col(f"f.{c}"))
            cond = eq if cond is None else (cond & eq)
        merged = bwd.join(fwd, cond, "inner")

        # Distance needs a numeric axis. A bare double cast works for
        # numeric ts columns but is ILLEGAL for timestamp/timestamp_ntz
        # in Spark 4 — route those through unix_micros (ntz values are
        # pinned to UTC first so the delta is tz-independent). The axis
        # conversion is chosen PER COLUMN from that column's dtype IN
        # THE PASS OUTPUT: the probe ts arrives union-COERCED to the
        # common (left_ts, right_ts) type, while _bwd_ts/_fwd_ts keep
        # the right frame's original type inside the payload struct —
        # reading the input frames' dtypes would mis-route a mixed
        # date-vs-timestamp call. Dates scale to microseconds so both
        # sides share one axis unit.
        probe_ts_type = dict(bwd.dtypes)[left_ts]
        bwd_ts_type = dict(bwd.dtypes)["_bwd_ts"]
        fwd_ts_type = dict(fwd.dtypes)["_fwd_ts"]
        us_per_day = 86_400_000_000.0

        def _axis(c: "F.Column", ts_type: str) -> "F.Column":
            if ts_type.startswith("timestamp_ntz"):
                return F.unix_micros(F.to_utc_timestamp(c, "UTC")).cast("double")
            if ts_type.startswith("timestamp"):
                return F.unix_micros(c).cast("double")
            if ts_type == "date":
                return F.unix_date(c).cast("double") * us_per_day
            return c.cast("double")

        probe_axis = _axis(F.col(f"b.{left_ts}"), probe_ts_type)
        d_b = F.abs(probe_axis - _axis(F.col("_bwd_ts"), bwd_ts_type))
        d_f = F.abs(_axis(F.col("_fwd_ts"), fwd_ts_type) - probe_axis)
        pick_backward = F.col("_fwd_ts").isNull() | (
            F.col("_bwd_ts").isNotNull() & (d_b <= d_f)  # ties go backward
        )
        out_vals = [
            F.when(pick_backward, F.col(f"_bwd_{c}"))
            .otherwise(F.col(f"_fwd_{c}"))
            .alias(c)
            for c in value_cols
        ]
        return merged.select(*[F.col(f"b.{c}") for c in join_cols], *out_vals)
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    keys = [on] if isinstance(on, str) else list(on)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    value_cols = list(value_cols)

    # Reference rows sort before probe rows at equal ts for inclusive
    # semantics, after for exclusive; forward direction mirrors both.
    probe_rank = 1 if allow_exact_matches else 0
    ref_rank = 1 - probe_rank

    # Value columns travel as ONE struct so last(ignorenulls) carries a
    # whole reference row: a NULL inside the matched reference row stays
    # NULL instead of being back-filled from an older row per-column.
    payload_type = StructType([
        StructField(c, right.schema[c].dataType, True) for c in value_cols
    ])
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(probe_rank).alias("_asof_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(payload_type).alias("_asof_payload"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(ref_rank).alias("_asof_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_asof_payload"),
    )

    # Third sort key: DESCENDING payload struct, so `last()` lands on
    # the MINIMUM payload tuple among reference rows that tie on
    # (ts, side) — without it two references with identical (key, ts)
    # resolve by shuffle order, which a hash-checked oracle cannot
    # reproduce. Probe rows carry a NULL payload; desc puts NULLs last
    # within their (ts, side) group, which cannot cross the side
    # boundary, so probe ordering is unaffected. Requires value_cols
    # to be orderable types (true for every Spark atomic type).
    if direction == "backward":
        order = [
            F.col("_asof_ts").asc(),
            F.col("_asof_side").asc(),
            F.col("_asof_payload").desc(),
        ]
    else:  # forward: earliest reference at-or-after the probe — walk the
        # timeline in reverse so "last seen reference" is the nearest
        # future one; side stays ascending so the inclusive/exclusive
        # tie-break keeps working.
        order = [
            F.col("_asof_ts").desc(),
            F.col("_asof_side").asc(),
            F.col("_asof_payload").desc(),
        ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = r_tagged.unionByName(l_tagged).withColumn(
        "_asof_payload", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    return filled.where(F.col("_asof_side") == probe_rank).select(
        *keys,
        F.col("_asof_ts").alias(left_ts),
        *left_payload,
        *[F.col(f"_asof_payload.{c}").alias(c) for c in value_cols],
    )
