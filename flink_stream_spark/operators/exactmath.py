"""Cross-engine-deterministic rounding of integer ratios.

``ROUND(double, 6)`` is engine-DIVERGENT exactly on representational
half-boundaries: Spark HALF_UPs the shortest-decimal repr of the
double (``BigDecimal.valueOf``), DuckDB rounds the raw binary value.
For a ratio of integers the boundary is not rare-luck but
STRUCTURAL: whenever the denominator (after reduction) carries a 2^7
or 5^7 factor, the exact ratio has 7 decimal digits ending in 5 and
the two engines are GUARANTEED to disagree (first hit:
``sample_dsir_importance`` at sf0.1 — 256024/16/1e6 = 0.0160015 →
Spark 0.016002, DuckDB 0.016001; Jaccard's |∩|/|∪| hits the same
class whenever the union size is a multiple of 128).

The fix: round half-up AT MICRO PRECISION in exact arithmetic —
``floor(num·1e6/den + 0.5)`` — then ONE int→double division by 1e6.
num·1e6 is exact in float64 up to num ≤ 9·10^9; the division is
correctly rounded to the same double in both engines; when the true
quotient is exactly k+0.5 that value is representable, so the
correctly-rounded division yields it EXACTLY and floor(x+0.5) is the
true half-up in both engines (and half-up-toward-+inf for negative
ratios, consistently). Float-valued expressions (ln/sqrt/corr
outputs) don't need this: their shortest reprs have ~17 significant
digits and never land on a 7-decimal boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round6_ratio(num: Column, den: Column) -> Column:
    """num/den rounded half-up at 6 decimals, bit-identical across
    engines for integer num/den (num ≤ ~9e9). Use instead of
    ``F.round(num/den, 6)`` on any integer ratio that feeds a hashed
    output column."""
    return (
        F.floor(
            num.cast("double") * F.lit(1000000.0) / den.cast("double")
            + F.lit(0.5)
        ).cast("bigint")
        / F.lit(1000000.0)
    )


def round6_ratio_sql(num: str, den: str) -> str:
    """The DuckDB twin of ``round6_ratio`` — splice into oracle SQL in
    place of ``ROUND(CAST({num} AS DOUBLE) / ({den}), 6)``."""
    return (
        f"CAST(FLOOR(CAST({num} AS DOUBLE) * 1000000.0 / "
        f"CAST({den} AS DOUBLE) + 0.5) AS BIGINT) / 1000000.0"
    )
