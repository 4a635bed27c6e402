"""Sample-based 4-type inference.

The reference infers exactly four types — integer, float, boolean, string —
from ONE string sample via Python parse attempts (``_infer_type``,
``/root/reference/neo4j_export.py:1221-1244``). Bit-exact parity matters for
the importer-model JSON (quirks: ``"1_000"``→integer, ``"  7 "``→integer,
``"nan"``/``"inf"``/``"1e5"``→float, ``"0x1F"``→string, ``"FALSE"``→boolean;
empty/``"NULL"``→string). The driver-side ``infer_type`` here implements
those Python lexing rules directly.

``infer_type_col`` is the *distributed* variant for inferring over many rows
(an engine extension — the reference only ever looks at one row): a regex
cascade replicating Python's int()/float() grammar so results agree with the
driver-side function, evaluated JVM-side (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python int() literal grammar (underscores between digits, surrounding
# whitespace tolerated, optional sign).
_INT_RE = r"^\s*[+-]?[0-9](_?[0-9])*\s*$"
# Python float() grammar: decimal forms, exponents, inf/infinity/nan
# (case-insensitive), underscores between digits.
_DIGITS = r"[0-9](_?[0-9])*"
_FLOAT_RE = (
    r"^\s*[+-]?("
    rf"({_DIGITS})?\.({_DIGITS})([eE][+-]?{_DIGITS})?"  # .5  1.5  1.5e3
    rf"|({_DIGITS})\.?([eE][+-]?{_DIGITS})?"  # 5.  5  5e3
    r"|[iI][nN][fF]([iI][nN][iI][tT][yY])?"
    r"|[nN][aA][nN]"
    r")\s*$"
)


def infer_type(value) -> str:
    """Infer {integer,float,boolean,string} from one sample value.

    Bit-exact replica of the reference's precedence and quirks
    (``neo4j_export.py:1221-1244``): falsy/"NULL" → string; int() parses →
    integer; float() parses → float; lower() in {true,false} → boolean;
    else string.
    """
    if not value or value == "NULL":
        return "string"
    try:
        int(value)
        return "integer"
    except (ValueError, TypeError):
        pass
    try:
        float(value)
        return "float"
    except (ValueError, TypeError):
        pass
    if isinstance(value, str) and value.lower() in ["true", "false"]:
        return "boolean"
    return "string"


def infer_type_col(col: Column) -> Column:
    """Distributed type inference over a string column (JVM-side regex).

    Matches ``infer_type`` on every value covered by Python's numeric
    literal grammar; stays inside whole-stage codegen (no Python UDF), so
    it is safe to run over billions of rows, e.g.
    ``df.groupBy(infer_type_col(col("v"))).count()`` for a type histogram.
    """
    return (
        F.when(col.isNull() | (col == "") | (col == "NULL"), F.lit("string"))
        .when(col.rlike(_INT_RE), F.lit("integer"))
        .when(col.rlike(_FLOAT_RE), F.lit("float"))
        .when(F.lower(col).isin("true", "false"), F.lit("boolean"))
        .otherwise(F.lit("string"))
    )


def infer_nullable(sample) -> bool:
    """Sample-based nullability (reference :540, :659, :811, :917)."""
    return sample in ["", "NULL", None]
