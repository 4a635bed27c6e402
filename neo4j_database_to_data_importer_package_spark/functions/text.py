"""Text primitives shared by the dedup / text-analysis operators.

Everything here is JVM-side (built-in functions / SQL exprs inside
whole-stage codegen) — no Python UDFs in these hot paths. Tokenization
is deliberately simple and engine-portable (space split + empty-token
filter) so DuckDB oracles can reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text, empties dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), " "), lambda x: x != "")


def word_shingles(tok_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    ``transform(sequence(...))`` stays in codegen; for a doc with t
    tokens this yields t-n+1 shingles.
    """
    if n == 1:
        return tok_col
    # sequence(1, size-n+1) is empty when size < n (sequence errors on
    # descending ranges, so guard with a when()).
    t = tok_col
    return F.when(F.size(t) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )


def normalized_text(col: Column | str) -> Column:
    """Canonical form for exact dedup / fingerprinting: lowercase,
    whitespace collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_md5(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 is identical across engines (and stable across Spark versions),
    unlike ``hash()``/``xxhash64`` which are Spark-internal.
    """
    return F.md5(normalized_text(col))


# Small per-language stopword lists for the n-gram/stopword language
# heuristic (deterministic, engine-portable).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "zh": ["的", "了", "是", "我", "不", "在", "有", "他"],
}
