"""Bucketed table layout: co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a repeated fact-fact join (events ⋈ events,
orders ⋈ lineitem, pattern-store merges) is re-shuffling both sides on the
join key every query. Spark's bucketing fixes the layout ONCE at write
time: ``bucketBy(n, key)`` hash-partitions rows into n files per
partition, records the bucket spec in the catalog, and every later join or
groupBy on the bucket key reads co-located buckets directly — the
physical plan shows SortMergeJoin with NO Exchange on either side
(``has_shuffle`` below makes that assertable in tests/CI).

Rules that make it work (and that the helpers enforce or document):
  * both sides bucketed on the SAME columns with the SAME bucket count
    (or a divisor — Spark 3.1+ coalesces);
  * the join columns must be exactly the bucket columns;
  * buckets are per-table-write, so this is for curated layouts (the
    pattern store, a canonical events table), not ad-hoc scans;
  * ``sortBy`` within buckets additionally removes the Sort before SMJ.

The reference has no equivalent (ClickHouse ORDER BY keys serve reads,
not joins); this is pure Spark-side value for the training-data pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed catalog table. ``num_buckets`` should
    target bucket files of 100-500 MB at the expected table size — too few
    buckets caps join parallelism, too many makes small files."""
    writer = (
        df.write.format(file_format)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


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
