from querysight_spark.functions.normalize import normalize_query, pattern_id, with_pattern_columns
from querysight_spark.functions.sqlextract import extract_tables, extract_tables_udf

__all__ = [
    "normalize_query",
    "pattern_id",
    "with_pattern_columns",
    "extract_tables",
    "extract_tables_udf",
]
