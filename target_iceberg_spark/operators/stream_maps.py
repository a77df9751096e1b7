"""Stream maps + record flattening — the reference's declared transform
capabilities (SURVEY §2 A13/A14; reference meltano.yml:15-16, semantics
SDK-inherited from the Meltano Singer SDK).

A stream map is a config-driven per-stream transform applied between
source and sink:
  - ``filter``: SQL boolean expression; rows failing it are dropped
  - ``columns``: mapping new_name -> SQL expression (use ``__else__:
    None`` semantics via ``keep_rest``) — covers rename, derived
    columns, and property removal
  - ``drop``: columns to remove after the above

Record flattening unnests struct columns into ``parent__child``
top-level columns up to ``max_depth`` — the Singer SDK's flattening
contract (separator ``__``).

Both are pure DataFrame transforms (select/withColumn/filter with
``F.expr``), so they compose with any source (listen loop, bulk demux,
streaming) and stay inside Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


@dataclass
class StreamMap:
    filter: str | None = None  # SQL boolean expr over source columns
    columns: dict[str, str] = field(default_factory=dict)  # name -> SQL expr
    drop: tuple[str, ...] = ()
    keep_rest: bool = True  # False => output ONLY the mapped columns


def apply_stream_map(df: DataFrame, smap: StreamMap) -> DataFrame:
    """Apply one stream map: filter -> derive/rename -> drop."""
    if smap.filter:
        df = df.where(F.expr(smap.filter))
    if smap.columns:
        if smap.keep_rest:
            for name, expr in smap.columns.items():
                df = df.withColumn(name, F.expr(expr))
        else:
            df = df.select(
                *[F.expr(expr).alias(name) for name, expr in smap.columns.items()]
            )
    if smap.drop:
        df = df.drop(*smap.drop)
    return df


def flatten_records(
    df: DataFrame, max_depth: int = 2, separator: str = "__"
) -> DataFrame:
    """Flatten struct columns to ``parent__child`` up to ``max_depth``
    levels; structs still nested beyond the depth limit are left as-is
    (matching the SDK's max-depth behavior)."""

    def flat_cols(schema: StructType, prefix: str, depth: int):
        cols = []
        for f in schema.fields:
            qualified = f"{prefix}.{f.name}" if prefix else f.name
            out_name = qualified.replace(".", separator)
            if isinstance(f.dataType, StructType) and depth < max_depth:
                cols.extend(flat_cols(f.dataType, qualified, depth + 1))
            else:
                cols.append(F.col(qualified).alias(out_name))
        return cols

    return df.select(*flat_cols(df.schema, "", 0))
