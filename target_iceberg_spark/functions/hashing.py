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


# Deterministic md5-prefix row split: first hex char of
# md5(CAST(col AS STRING)) landing in MD5_QUARTER_HEX selects an
# engine-portable, partitioning-stable 25% of rows. Used as the
# approx-distinct audit sample (plans/relational_extra.py) and the
# RHO-LOSS holdout split (plans/curation_rho.py) — keep both sides
# here so the hex set cannot silently diverge from an oracle.
MD5_QUARTER_HEX = ("0", "1", "2", "3")


def md5_quarter(col: Column | str, hex_set: tuple[str, ...] = MD5_QUARTER_HEX) -> Column:
    """Boolean: row is in the deterministic md5-prefix quarter."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, 1).isin(*hex_set)


def md5_quarter_sql(expr: str, hex_set: tuple[str, ...] = MD5_QUARTER_HEX) -> str:
    """DuckDB mirror of :func:`md5_quarter`.

    The IN list is built element-wise (not via Python tuple repr, whose
    1-element form ``('0',)`` is invalid SQL)."""
    in_list = ", ".join(repr(h) for h in hex_set)
    return f"substr(md5(CAST({expr} AS VARCHAR)), 1, 1) IN ({in_list})"
