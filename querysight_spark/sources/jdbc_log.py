"""A1 parity: external query-log source over JDBC.

The reference's primary input is a live ClickHouse ``system.query_log``
scan: a string-built, server-evaluated WHERE clause plus a LIMIT/OFFSET
pagination loop (/root/reference/utils/data_acquisition.py:81-192). The
Spark-first equivalent is ``spark.read.jdbc``:

  * predicates Catalyst can express are pushed to the warehouse (visible
    as ``PushedFilters`` in ``.explain``) — so callers simply build the
    same ``plans.patterns.filter_logs`` plan they use on parquet;
  * the pagination loop is replaced by partitioned parallel reads
    (``partition_column``/bounds/``num_partitions`` → one WHERE-range per
    task, executed concurrently, bounded memory per task) — at 100 TB of
    log this is N independent range scans instead of O(n²) re-scans of an
    ORDER BY under a moving OFFSET;
  * explicit ``predicates`` (one per partition) cover warehouses where the
    split column isn't numeric/temporal, e.g. hash-mod buckets.

Public JDBC only: any warehouse whose driver jar is on the Spark
classpath works; url/driver/credentials are caller-supplied arguments —
nothing is read from the environment and no endpoint is hardcoded.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

# ClickHouse system.query_log → engine QueryLog shape
# (/root/reference/utils/data_acquisition.py:124-141 selects these; the one
# rename it performs is event_time AS query_start_time).
CLICKHOUSE_QUERY_LOG_RENAMES: dict[str, str] = {"event_time": "query_start_time"}


def read_query_log_jdbc(
    spark: SparkSession,
    url: str,
    table: str = "system.query_log",
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    predicates: Sequence[str] | None = None,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    options: Mapping[str, str] | None = None,
    column_renames: Mapping[str, str] = CLICKHOUSE_QUERY_LOG_RENAMES,
) -> DataFrame:
    """Read a warehouse query-log table over JDBC into the engine's
    QueryLog shape.

    Exactly one parallelism mode may be used: ``partition_column`` +
    ``lower_bound``/``upper_bound``/``num_partitions`` (Spark generates
    non-overlapping range predicates), or explicit ``predicates`` (one
    partition per entry — the caller guarantees they tile the table).
    With neither, the read is a single partition — fine for dims, wrong
    for a big fact table.

    ``table`` may be any dbtable expression the warehouse accepts,
    including a ``(SELECT ...) AS src`` pushdown subquery for projections
    the driver-side rename map can't express.
    """
    if predicates is not None and partition_column is not None:
        raise ValueError("pass either predicates or partition_column, not both")

    props: dict[str, str] = {"fetchsize": str(fetch_size)}
    if driver:
        props["driver"] = driver
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    if options:
        props.update({k: str(v) for k, v in options.items()})

    if predicates is not None:
        df = spark.read.jdbc(
            url=url, table=table, predicates=list(predicates), properties=props
        )
    elif partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column needs lower_bound, upper_bound and num_partitions"
            )
        df = spark.read.jdbc(
            url=url,
            table=table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=props,
        )
    else:
        df = spark.read.jdbc(url=url, table=table, properties=props)

    # case-insensitive match: warehouses fold unquoted identifiers to their
    # preferred case (Derby/Oracle upper, Postgres lower) — the engine shape
    # is lowercase
    by_lower = {c.lower(): c for c in df.columns}
    for src, dst in column_renames.items():
        actual = by_lower.get(src.lower())
        if actual is not None and actual != dst:
            df = df.withColumnRenamed(actual, dst)
    return df
