"""Skew-resistant aggregation: salted two-phase groupBy.

When one grouping key dominates (hot user, null key, celebrity id), a
plain groupBy sends that key's entire volume to one reducer. The salted
pattern splits each key into ``buckets`` sub-groups on a deterministic
salt, partially aggregates per (key, salt) — spreading the hot key over
``buckets`` reducers — then combines per key. Total shuffle volume
drops to one row per (key, salt) per map partition.

The salt must be DETERMINISTIC (derived from a row-distinguishing
column, not rand()) so results are reproducible and oracle-checkable.
Note AQE's skew-join splitting handles skewed JOINS at runtime; salting
remains the tool for skewed AGGREGATES with expensive per-group state
and for reproducible plans.

Supported combinable aggregates: sum / count / min / max (avg = sum
pair + final divide).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_src: str | Column,
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregate.

    ``aggs``: output_name -> (op, column) with op in sum|count|min|max.
    ``salt_src``: high-cardinality column the salt is hashed from.
    """
    salt = F.pmod(F.hash(salt_src), F.lit(buckets)).alias("_salt")
    phase1_aggs = []
    phase2_aggs = []
    for name, (op, col) in aggs.items():
        if op == "sum":
            phase1_aggs.append(F.sum(col).alias(name))
            phase2_aggs.append(F.sum(name).alias(name))
        elif op == "count":
            phase1_aggs.append(F.count(col).alias(name))
            phase2_aggs.append(F.sum(name).alias(name))
        elif op == "min":
            phase1_aggs.append(F.min(col).alias(name))
            phase2_aggs.append(F.min(name).alias(name))
        elif op == "max":
            phase1_aggs.append(F.max(col).alias(name))
            phase2_aggs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"unsupported combinable op: {op}")
    partial = df.groupBy(*keys, salt).agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str | Column,
    buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: explode the (small) dim side ``buckets``
    times and route each fact row to one replica by a deterministic salt,
    so a hot join key spreads over ``buckets`` reducers instead of one.

    AQE's skew-join splitting handles this at runtime for sort-merge
    joins; explicit salting remains the reproducible-plan tool and the
    only option when AQE is off or the skew is in a broadcast-ineligible
    mid-size dim. The salt derives from ``salt_src`` (a row-
    distinguishing fact column), never rand(), so the result is
    deterministic and oracle-checkable. Dim replication costs
    |dim| * buckets rows — keep buckets ~ the reducer fan-out needed for
    the hottest key, not larger."""
    salt = F.pmod(F.hash(salt_src), F.lit(buckets))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return fact_s.join(dim_s, [key, "_salt"]).drop("_salt")
