"""Engine-portable rounding.

Spark's ``round()`` converts the double to its shortest decimal string
and rounds HALF_UP; DuckDB rounds the binary double directly. At exact
half-points (…xxx5) they disagree. ``round_half_up`` computes
``floor(x·10^d + 0.5)/10^d`` — pure IEEE double ops that give the SAME
result in every engine for the same input double, which is what the
DuckDB-oracle comparison needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column | str, digits: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def round_sql(expr: str, digits: int) -> str:
    """The identical formula as SQL text (for oracle queries)."""
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent sum of a money-like double column.

    ``sum(double)`` accumulates in partition order, so Spark's partial
    aggregation and DuckDB's single-threaded scan can disagree by ~1e-3
    at 1e6 magnitude — enough to flip a cent-rounded result (7 of 4188
    q7 groups in CORRECTNESS_r03). Casting each element to a decimal
    first makes the addition exact, hence identical for EVERY execution
    order, partition count, and engine. For 2-dp prices and their 2-dp
    discount/tax factors the cast is an exact recovery (products have
    ≤4/6 decimal places), not a rounding.

    Returns a double (cast after the exact sum) so downstream rounding
    and schemas are unchanged. ``dsum_sql`` is the oracle twin.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB twin of ``dsum`` (identical cast→exact-sum→double)."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"
