from querysight_spark.sources.layout import (
    co_located_join,
    ensure_database,
    has_shuffle,
    write_bucketed,
    write_partitioned,
)
from querysight_spark.sources.catalog import load_table, load_tables, register_views
from querysight_spark.sources.jdbc_log import read_query_log_jdbc
from querysight_spark.sources.snapshot_cache import SnapshotCache

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_query_log_jdbc",
    "write_bucketed",
    "write_partitioned",
    "ensure_database",
    "co_located_join",
    "has_shuffle",
    "SnapshotCache",
]
