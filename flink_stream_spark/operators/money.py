"""Exact scaled-integer money arithmetic for hot aggregation loops.

Money columns in the fixtures are 2-dp values stored as double. The
DuckDB oracles cast them to DECIMAL(18,2) before multiplying and
summing; mirroring that literally in Spark puts a java.math.BigDecimal
multiply in every aggregation row (decimal(18,2) x decimal(18,2) ->
decimal(37,4) leaves the compact long representation), which dominates
the CPU of every revenue query.

These helpers compute the *same exact values* in long arithmetic:

- `_cents(c)`: floor(x*100 + 0.5) recovers the 2-dp integer exactly —
  the stored double is within ~1e-9 of the true 2-dp value, so it is
  never at a rounding boundary, and the result equals
  CAST(x AS DECIMAL(18,2)) * 100 for every fixture value. Works for
  negative 2-dp values too (no boundary ties exist).
- per-row products stay far inside long range (price_cents <= 1e9 x
  factor <= 200 per row);
- `_sum_scaled` casts each row to DECIMAL(18,0) (a compact, long-backed
  Decimal — no BigDecimal allocation) so SUM accumulates in
  DECIMAL(28,0): overflow-safe at any corpus size, where a raw long
  SUM would overflow around 1e19 scaled units (~10 TB of lineitem);
- the final decimal division by 10^scale is exact (Spark's result
  scale >= the true scale of the quotient), and the single cast to
  double performs the same correctly-rounded conversion as the
  oracle's CAST(SUM(DECIMAL...) AS DOUBLE).

Every converted query is hash-checked against its unchanged
DECIMAL-arithmetic oracle at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cents(c: str | Column, mult: int = 100) -> Column:
    """Exact scaled integer of a fixed-point money double (see module
    docstring). ``mult`` is 10^scale of the column (100 for 2-dp)."""
    col = F.col(c) if isinstance(c, str) else c
    # floor, not a truncating cast: floor(x+0.5) rounds half-up for
    # BOTH signs (-1.004 -> -100 cents), where trunc-toward-zero would
    # give -99; identical for the non-negative majority
    return F.floor(col * mult + F.lit(0.5)).cast("long")


def _sum_scaled(expr: Column, scale: int) -> Column:
    """SUM of a scaled-long money expression as DOUBLE — identical to
    the oracle's CAST(SUM(DECIMAL-expr) AS DOUBLE)."""
    div = F.lit(10**scale).cast(f"decimal({scale + 1},0)")
    return (F.sum(expr.cast("decimal(18,0)")) / div).cast("double")


def _rev4(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """price * (1 - discount) scaled by 1e4, exact in long arithmetic —
    the TPC-H revenue term of CAST(price AS DECIMAL(18,2)) *
    CAST(1 - discount AS DECIMAL(18,2))."""
    return _cents(price) * (F.lit(100) - _cents(disc))
