"""Engine-portable fixed-digit rounding.

ROUND(x, d) is NOT portable when x lands exactly on a rounding
half-digit: Spark rounds the SHORTEST DECIMAL REPR of the double with
BigDecimal HALF_UP while DuckDB rounds the BINARY double with
std::round, and an exact-half rational (e.g. an integer-cents average
like 49.19125 with denominator 10^4 * n) resolves differently — the
round-12 sf0.1 parity sweep caught join_salted flipping the 4th
decimal on 64 of 100k users this way. FLOOR(x * 10^d + 0.5) / 10^d is
pure IEEE arithmetic: identical inputs give identical doubles on both
engines, every time (half-up toward +inf for negatives — a DIFFERENT
tie rule than ROUND's, but the same one everywhere).

Use this form whenever the rounded value is a RATIONAL with a small
denominator (integer-unit averages, count ratios) — those actually hit
exact halves; transcendental-valued expressions keep plain ROUND (a
half-digit shortest-repr is a measure-zero coincidence there, and the
whole registry's history shows it doesn't occur)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(col: Column, digits: int) -> Column:
    """FLOOR(col * 10^digits + 0.5) / 10^digits as a DOUBLE.

    Domain bound: requires |col| < 2^63 / 10^digits. Spark's F.floor on
    a double returns LONG, while the DuckDB mirror's FLOOR stays DOUBLE,
    so beyond that magnitude the Spark side overflows where the mirror
    saturates to the double grid and the two diverge. All current call
    sites (ratios, averages, cents) are orders of magnitude inside it."""
    scale = float(10**digits)
    return F.floor(col * scale + 0.5).cast("double") / F.lit(scale)


def portable_round_sql(expr: str, digits: int) -> str:
    """DuckDB mirror of :func:`portable_round`."""
    scale = float(10**digits)
    return f"CAST(FLOOR(({expr}) * {scale} + 0.5) AS DOUBLE) / {scale}"
