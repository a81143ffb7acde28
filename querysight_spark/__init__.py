"""querysight_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hyperskill/querysight.

The reference (studied read-only at /root/reference/) is a ClickHouse
query-log analytics pipeline: scan → pattern hash-agg → SQL table extraction
→ dbt-catalog coverage joins → incremental state → reports/recommendations.
This package re-expresses every one of those computations as declarative
PySpark DataFrame/SQL plans that Catalyst optimizes and Tungsten executes,
plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout (SURVEY.md §7.1):
    session      SparkSession factory + scale-aware conf
    schemas      explicit StructTypes (never infer)
    sources      parquet/json readers, snapshot cache with TTL manifest
    functions    normalize (G1), sqlextract (H1), scalar helpers (G*)
    plans        patterns (D*), coverage (C*/F*), report (D4/D5,E*), recommend (H2)
    operators    dedup, similarity, textstats, multimodal (training-data ops)
    streaming    structured-streaming variant of the pattern pipeline (I1-I4)
"""

__version__ = "0.1.0"
