"""G1 — query normalization + engine-local pattern identity.

The reference's pattern key is ClickHouse
``cityHash64(normalizeQuery(query))`` (/root/reference/utils/data_acquisition.py:133).
cityHash64 is not reproducible in Spark, and doesn't need to be: pattern ids
are engine-local (SURVEY §7.4.1) — correctness is defined on grouping
behavior over the normalized text, never on hash equality.

Normalization masks literals the way ClickHouse ``normalizeQuery`` does:
string literals → ``?``, numeric literals → ``?``, collapsed whitespace.
Everything is a JVM-side ``regexp_replace`` chain — no UDF, stays inside
whole-stage codegen, fully pushdown-transparent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: strings first (so digits inside strings don't survive),
# then numbers, then whitespace collapse.
_STRING_LIT = r"'(?:[^']|'')*'"
_NUM_LIT = r"\b\d+(?:\.\d+)?\b"
_COMMENT_LINE = r"--[^\n]*"
_COMMENT_BLOCK = r"/\*.*?\*/"


def normalize_query(col: Column) -> Column:
    """Literal-masked, whitespace-collapsed, lowercased query template."""
    c = F.regexp_replace(col, _COMMENT_BLOCK, " ")
    c = F.regexp_replace(c, _COMMENT_LINE, " ")
    c = F.regexp_replace(c, _STRING_LIT, "?")
    c = F.regexp_replace(c, _NUM_LIT, "?")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.lower(F.trim(c))


def pattern_id(normalized: Column) -> Column:
    """Engine-local 64-bit pattern identity, rendered as a string id."""
    return F.conv(F.hex(F.xxhash64(normalized)), 16, 10)


def with_pattern_columns(df: DataFrame, query_col: str = "query") -> DataFrame:
    """Attach ``normalized_query`` (if absent) and ``pattern_id``.

    When the input already carries a ``normalized_query`` column (the
    fixture contract, FIXTURES.md §2.1) we key off it directly so grouping
    never depends on our masking heuristics.
    """
    if "normalized_query" not in df.columns:
        df = df.withColumn("normalized_query", normalize_query(F.col(query_col)))
    return df.withColumn("pattern_id", pattern_id(F.col("normalized_query")))
