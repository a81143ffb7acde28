from querysight_spark.sources.bucketed import co_located_join, has_shuffle, write_bucketed
from querysight_spark.sources.catalog import load_table, load_tables, register_views
from querysight_spark.sources.jdbc_log import read_query_log_jdbc
from querysight_spark.sources.snapshot_cache import SnapshotCache

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_query_log_jdbc",
    "write_bucketed",
    "co_located_join",
    "has_shuffle",
    "SnapshotCache",
]
