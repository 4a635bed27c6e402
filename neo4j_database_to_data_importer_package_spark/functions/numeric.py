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
