"""Explicit StructTypes for every entity the engine touches (SURVEY §1.2).

The reference declares its schemas as dataclass field types
(/root/reference/utils/models.py:29-249); we declare Spark StructTypes and
never rely on inference. Set-valued attributes (users, tables) are native
ArrayType columns canonicalized with sort_array — the reference's SQLite
junction tables (utils/cache_manager.py:127-171) exist only because SQLite
lacks arrays, so we drop them.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Raw fact row: one executed query (QueryLog, utils/models.py:29-93; column
# projection utils/data_acquisition.py:120-138).
QUERY_LOG_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("query", StringType(), True),
        StructField("normalized_query", StringType(), True),
        StructField("query_kind", StringType(), True),
        StructField("user", StringType(), True),
        StructField("query_start_time", TimestampType(), True),
        StructField("query_duration_ms", DoubleType(), True),
        StructField("read_rows", LongType(), True),
        StructField("read_bytes", LongType(), True),
        StructField("result_rows", LongType(), True),
        StructField("result_bytes", LongType(), True),
        StructField("memory_usage", LongType(), True),
        StructField("current_database", StringType(), True),
        StructField("databases", ArrayType(StringType()), True),
        StructField("tables", ArrayType(StringType()), True),
        StructField("columns", ArrayType(StringType()), True),
    ]
)

# Aggregate row: one normalized query shape (QueryPattern, utils/models.py:95-204).
QUERY_PATTERN_SCHEMA = StructType(
    [
        StructField("pattern_id", StringType(), False),
        StructField("normalized_query", StringType(), True),
        StructField("sql_pattern", StringType(), True),
        StructField("frequency", LongType(), False),
        StructField("total_duration_ms", DoubleType(), True),
        StructField("avg_duration_ms", DoubleType(), True),
        StructField("first_seen", TimestampType(), True),
        StructField("last_seen", TimestampType(), True),
        StructField("users", ArrayType(StringType()), True),
        StructField("tables_accessed", ArrayType(StringType()), True),
        StructField("memory_usage", LongType(), True),
        StructField("total_read_rows", LongType(), True),
        StructField("total_read_bytes", LongType(), True),
    ]
)

# dbt model-catalog dimension, pre-exploded into lookup-key variants the way
# the reference registers them (utils/dbt_mapper.py:176,257-258).
DBT_MODEL_MAP_SCHEMA = StructType(
    [
        StructField("table_key", StringType(), False),  # lowercase 'name' or 'schema.name'
        StructField("model_name", StringType(), False),
        StructField("schema", StringType(), True),
        StructField("materialized", StringType(), True),
        # lower rank wins when several keys resolve (exact > bare > schema.table)
        StructField("match_rank", IntegerType(), False),
    ]
)

# dbt source refs (utils/dbt_mapper.py:94-118): physical table matched by
# equality or '.'-suffix (utils/models.py:346-351).
DBT_SOURCES_SCHEMA = StructType(
    [
        StructField("source_ref", StringType(), False),
        StructField("physical_table", StringType(), False),
    ]
)

# dbt dependency DAG as an edge list (adjacency sets at utils/models.py:211-222).
DBT_EDGES_SCHEMA = StructType(
    [
        StructField("model", StringType(), False),
        StructField("depends_on", StringType(), False),
    ]
)

# dbt model catalog (one row per model; DBTModel, utils/models.py:206-249).
DBT_MODEL_SCHEMA = StructType(
    [
        StructField("model_name", StringType(), False),
        StructField("schema", StringType(), True),
        StructField("database", StringType(), True),
        StructField("materialized", StringType(), True),
        StructField("columns", MapType(StringType(), StringType()), True),
        StructField("freshness_seconds", LongType(), True),
    ]
)

# Recommendation output row (AIRecommendation, utils/models.py:402-430).
RECOMMENDATION_SCHEMA = StructType(
    [
        StructField("pattern_id", StringType(), False),
        StructField("rec_type", StringType(), False),
        StructField("description", StringType(), True),
        StructField("impact", StringType(), True),
        StructField("suggested_sql", StringType(), True),
    ]
)

# --- driver testdata schemas (FIXTURES.md §1) -------------------------------

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

# Multimodal asset table (extension; SURVEY §7.2 phase 8): opaque binary
# payload + typed metadata struct. The decode stage is stubbed (no image/audio
# libs in this container) but the schema/partitioning/UDF plumbing is real.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
