"""Pattern pipeline: log filters (B2-B6), pattern hash-agg (D1/D2/E1),
cross-run merge (D3), pattern post-filters (B7), complexity score (D7).

The reference aggregates row-at-a-time in driver Python
(/root/reference/utils/data_acquisition.py:194-232 +
utils/models.py:113-154). Here the same computation is ONE declarative
groupBy: Catalyst plans it as partial (map-side) + final hash aggregation,
so at 100 TB each executor pre-combines its splits and only
patterns × partial-state rows cross the shuffle — the single biggest
architectural win over the reference (SURVEY §4).

Determinism decisions (SURVEY §7.4): set-valued outputs are
``sort_array``-canonicalized; the representative ``sql_pattern`` is
``min(query)`` rather than the reference's arrival-order "first query wins"
(utils/data_acquisition.py:211-214, which silently depends on scan order).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from querysight_spark.functions.normalize import with_pattern_columns
from querysight_spark.functions.sqlextract import extract_tables_udf
from querysight_spark.operators.parallel import floor_parallelism

SLOW_QUERY_MS = 1000.0  # utils/data_acquisition.py:114


def filter_logs(
    logs: DataFrame,
    start_time=None,
    end_time=None,
    focus: str = "ALL",
    include_users: Sequence[str] = (),
    exclude_users: Sequence[str] = (),
    query_kinds: Sequence[str] = (),
    select_tables: Sequence[str] = (),
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """B2-B6 scan predicates, applied BEFORE any UDF so Catalyst pushes them
    into the parquet scan (visible as PushedFilters in .explain).

    Mirrors the WHERE clause built at utils/data_acquisition.py:81-141:
    time range, case-insensitive user include/exclude, query-kind IN,
    array-membership-with-wildcard on ``tables``, slow-focus predicate.
    Unlike the reference, ``sample_fraction`` actually samples (the
    reference accepts but never applies it — fidelity F5).
    """
    df = logs
    if start_time is not None:
        df = df.where(F.col("query_start_time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("query_start_time") < F.lit(end_time))
    if include_users:
        df = df.where(F.lower(F.col("user")).isin([u.lower() for u in include_users]))
    if exclude_users:
        df = df.where(~F.lower(F.col("user")).isin([u.lower() for u in exclude_users]))
    if query_kinds:
        df = df.where(F.upper(F.col("query_kind")).isin([k.upper() for k in query_kinds]))
    if select_tables:
        # arrayExists(x -> x LIKE pat, tables), OR-reduced over requested
        # patterns (utils/data_acquisition.py:103-107)
        def _like(pat: str):
            # closure factory, not a default-arg lambda: pyspark inspects the
            # lambda arity to decide unary-vs-binary higher-order functions
            return lambda x: x.like(pat)

        conds: Column | None = None
        for pat in select_tables:
            c = F.exists(F.col("tables"), _like(pat))
            conds = c if conds is None else (conds | c)
        df = df.where(conds)
    if focus.upper() == "SLOW":
        df = df.where(F.col("query_duration_ms") > SLOW_QUERY_MS)
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=seed)
    return df


def aggregate_patterns(
    logs: DataFrame,
    min_frequency: int = 2,
    extract_from_sql: bool = True,
    sort: bool = True,
    extra_group_cols: Sequence[str] = (),
) -> DataFrame:
    """D1 pattern hash-agg keyed by the normalized query, D2 HAVING, E1 sort.

    ``extract_from_sql`` folds tables parsed out of the SQL text (H1 UDF)
    into the log-provided ``tables`` array, mirroring
    utils/models.py:129-133 — applied per-row BEFORE the groupBy so the
    union happens once per log row, not per pattern re-walk.

    ``sort=False`` skips the E1 impact sort (r14 opt, guide §2.4): when a
    consumer's next operators destroy row order anyway (explode + distinct,
    union + re-aggregate, semi-join feeds), Catalyst's EliminateSorts only
    removes the sort if ANOTHER global sort directly follows — with
    intervening joins/aggs the range-partition Exchange + Sort of the whole
    pattern table survives and buys nothing. Callers that present or
    paginate the impact ordering keep the default.
    """
    # NOTE (round 13, amended round 14): no parallelism floor on the
    # extract_from_sql=False path, deliberately — that stage is bound by
    # the serial scan+projection of the log itself (an A/B repartition
    # measured +0.35 s of pure exchange cost and no win). The
    # extract_from_sql=True path is different: the H1 ArrowEvalPython
    # stage fuses onto the scan, so a single-file source runs the whole
    # Python extractor on ONE core (the mm11/X200 class). Floored r14
    # A/B: 2.68 → 1.53 s warm at sf0.1; no-op at scale where file count
    # >= cores (guide §4, §2.5 input skew).
    if extract_from_sql:
        logs = floor_parallelism(logs)
    df = with_pattern_columns(logs)
    tables_col = F.coalesce(F.col("tables"), F.array())
    if extract_from_sql:
        tables_col = F.array_union(tables_col, extract_tables_udf(F.col("query")))
    df = df.withColumn("_all_tables", tables_col)

    patterns = (
        df.groupBy("pattern_id", "normalized_query", *extra_group_cols)
        .agg(
            F.count(F.lit(1)).alias("frequency"),
            F.sum("query_duration_ms").alias("total_duration_ms"),
            F.min("query_start_time").alias("first_seen"),
            F.max("query_start_time").alias("last_seen"),
            F.sort_array(F.collect_set("user")).alias("users"),
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("_all_tables")))
            ).alias("tables_accessed"),
            F.sum("memory_usage").alias("memory_usage"),
            F.sum("read_rows").alias("total_read_rows"),
            F.sum("read_bytes").alias("total_read_bytes"),
            F.min("query").alias("sql_pattern"),
        )
        .withColumn("avg_duration_ms", F.col("total_duration_ms") / F.col("frequency"))
    )
    if min_frequency > 1:
        patterns = patterns.where(F.col("frequency") >= min_frequency)
    if not sort:
        return patterns
    # E1 impact sort with a deterministic tie-break
    return patterns.orderBy(
        (F.col("frequency") * F.col("avg_duration_ms")).desc(), F.col("pattern_id")
    )


_MERGE_COLS = [
    "pattern_id",
    "normalized_query",
    "frequency",
    "total_duration_ms",
    "first_seen",
    "last_seen",
    "users",
    "tables_accessed",
    "memory_usage",
    "total_read_rows",
    "total_read_bytes",
    "sql_pattern",
]


def merge_patterns(prior: DataFrame, batch: DataFrame) -> DataFrame:
    """D3 cross-run merge: additive counters, set unions, min/max timestamps,
    recomputed average (utils/models.py:135-154 driven by
    utils/cache_manager.py:591-607).

    Expressed as union → re-aggregate, which Spark executes as one hash agg;
    with Delta this becomes MERGE, but plain-parquet union/re-agg has the
    same cost profile and no driver involvement. Idempotency (the reference
    double-counts overlapping windows — fidelity F9) is the caller's
    responsibility: dedupe batches by window id before calling (see
    SnapshotCache keys / streaming.foreachBatch which pass each window once).
    """
    return merge_pattern_runs(
        prior.select(_MERGE_COLS).unionByName(batch.select(_MERGE_COLS))
    )


def merge_pattern_runs(runs: DataFrame) -> DataFrame:
    """The D3 merge re-aggregation over ONE frame of per-run pattern rows
    (r14): callers that already hold every run's rows in a single frame —
    e.g. a run-tagged ``aggregate_patterns(extra_group_cols=("_run",))``
    computed in one scan of the log — merge here without unioning
    per-run branches that would each re-scan the source. Extra columns
    (the run tag) are dropped by the ``_MERGE_COLS`` projection."""
    return (
        runs.select(_MERGE_COLS).groupBy("pattern_id", "normalized_query")
        .agg(
            F.sum("frequency").alias("frequency"),
            F.sum("total_duration_ms").alias("total_duration_ms"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("users")))).alias("users"),
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("tables_accessed")))
            ).alias("tables_accessed"),
            F.sum("memory_usage").alias("memory_usage"),
            F.sum("total_read_rows").alias("total_read_rows"),
            F.sum("total_read_bytes").alias("total_read_bytes"),
            F.min("sql_pattern").alias("sql_pattern"),
        )
        .withColumn("avg_duration_ms", F.col("total_duration_ms") / F.col("frequency"))
    )


def filter_patterns(
    patterns: DataFrame,
    pattern_ids: Sequence[str] = (),
    min_avg_duration_ms: float | None = None,
    min_frequency: int | None = None,
    tables_any: Sequence[str] = (),
    models_any: Sequence[str] = (),
) -> DataFrame:
    """B7 pattern post-filters (utils/filtering.py:6-46): id membership,
    metric thresholds, set-overlap on tables / dbt models (F3)."""
    df = patterns
    if pattern_ids:
        df = df.where(F.col("pattern_id").isin(list(pattern_ids)))
    if min_avg_duration_ms is not None:
        df = df.where(F.col("avg_duration_ms") >= min_avg_duration_ms)
    if min_frequency is not None:
        df = df.where(F.col("frequency") >= min_frequency)
    if tables_any:
        df = df.where(
            F.arrays_overlap(
                F.col("tables_accessed"), F.array(*[F.lit(t) for t in tables_any])
            )
        )
    if models_any and "dbt_models_used" in df.columns:
        df = df.where(
            F.arrays_overlap(
                F.col("dbt_models_used"), F.array(*[F.lit(m) for m in models_any])
            )
        )
    return df


def with_complexity_score(patterns: DataFrame) -> DataFrame:
    """D7: 0.4·min(avg_ms/1000,1) + 0.4·min(freq/100,1) + 0.2·min(n_tables/5,1)
    (utils/models.py:156-165) as a pure column expression."""
    return patterns.withColumn(
        "complexity_score",
        0.4 * F.least(F.col("avg_duration_ms") / 1000.0, F.lit(1.0))
        + 0.4 * F.least(F.col("frequency") / 100.0, F.lit(1.0))
        + 0.2 * F.least(F.size("tables_accessed") / 5.0, F.lit(1.0)),
    )
