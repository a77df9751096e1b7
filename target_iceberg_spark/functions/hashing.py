"""Engine-portable hash-to-integer primitives.

The md5-hex-prefix-to-integer idiom is load-bearing for the oracle
gate: Spark's ``conv(substr(md5(x), s, w), 16, 10)`` and DuckDB's
``CAST(concat('0x', substr(md5(x), s, w)) AS BIGINT)`` produce the SAME
integer, which is what lets MinHash signatures, SimHash bits, and
feature-hash buckets be value-checked bit-exactly across engines. Keep
the two sides together here so a width/offset tweak cannot silently
diverge one call site from its oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex_int(hex_col: Column | str, start: int = 1, width: int = 8) -> Column:
    """Integer value of ``width`` hex chars of a hex-string column
    starting at 1-based ``start``. Returned as STRING by Spark's conv —
    cast at the call site (long for 8 chars, int for <= 7)."""
    c = F.col(hex_col) if isinstance(hex_col, str) else hex_col
    return F.conv(F.substring(c, start, width), 16, 10)


def hex_int_sql(hex_expr: str, start: int = 1, width: int = 8) -> str:
    """DuckDB mirror of :func:`hex_int` (already BIGINT-typed)."""
    return f"CAST(concat('0x', substr({hex_expr}, {start}, {width})) AS BIGINT)"
