from querysight_spark.plans.patterns import (
    aggregate_patterns,
    filter_logs,
    filter_patterns,
    merge_patterns,
    with_complexity_score,
)

__all__ = [
    "aggregate_patterns",
    "filter_logs",
    "filter_patterns",
    "merge_patterns",
    "with_complexity_score",
]
