"""Physical layout helpers: partitioned and bucketed writes (SCALE.md's
co-located-join path).

Bucketing pre-shuffles a table ONCE at write time: both sides of a
recurring equi-join bucketed by the join key into the same bucket count
join with NO exchange — the per-query shuffle disappears. At 100 TB this
is the difference between re-shuffling the fact table for every
pattern/user join and never shuffling it again. Partitioned writes give
partition pruning on the filter column instead.

Bucketed tables must be saved through the session catalog
(``saveAsTable`` — plain ``parquet(path)`` silently drops bucket
metadata, a classic trap); ``ensure_database`` pins them under an
explicit location so tests and deployments control the storage root.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Hive-style partition layout → scans with equality/IN filters on the
    partition columns prune directories before any IO."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table. Joins/aggregations
    keyed on ``bucket_cols`` between tables sharing ``num_buckets`` read
    pre-shuffled data — no exchange in the plan."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket columns. When both
    sides were written with ``write_bucketed`` on ``on``, the planned join
    has no Exchange (verify with ``has_shuffle``)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def has_shuffle(df: DataFrame) -> bool:
    """True when the physical plan contains a shuffle Exchange — the
    assertable core of every "this layout avoids the shuffle" claim in
    SCALE.md (broadcast exchanges don't count; they're the point)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.lstrip("+-* (0123456789) ").startswith("Exchange")
        for line in plan.splitlines()
    )
