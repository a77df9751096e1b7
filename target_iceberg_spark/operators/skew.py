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
