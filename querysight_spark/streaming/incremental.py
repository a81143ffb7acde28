"""Structured Streaming variant of the pattern pipeline (SURVEY §2.I).

The reference is a batch poller: it re-reads a sliding N-day window of the
append-only query log on every run (/root/reference/utils/data_acquisition.py:86-87)
and merges the result into SQLite pattern state
(utils/cache_manager.py:591-607) — with NO idempotency key, so overlapping
re-runs double-count (fidelity F9). This module is the Spark-native
restatement:

* I1 — ``stream_query_logs``: ``readStream`` over the log directory; new
  files are discovered incrementally instead of re-scanning the window.
* I4 — ``windowed_pattern_counts``: event-time windows + watermark give
  the late-data semantics the reference lacks (it silently re-reads).
* I2 — ``start_incremental_merge``: ``foreachBatch`` writes each
  micro-batch's PARTIAL pattern aggregate to ``state_dir/batch_id=N``.
  Replayed epochs overwrite the same partition, so the merge is
  idempotent by construction — the (pattern_id, window_id) keying decided
  in SURVEY §7.4.4, with Structured Streaming's epoch id as window_id.
* ``read_pattern_state`` / ``compact_pattern_state``: merged view /
  compaction via one re-aggregation (same shape as plans.patterns.merge_patterns).

Scale notes: per-batch aggregates are tiny relative to raw logs (patterns ×
batch), so state grows with #batches × #patterns, and compaction is a
single shuffle on pattern_id. The alternative — stateful streaming agg with
``outputMode("update")`` — keeps unbounded per-key state in the state
store; the batch-partition design bounds each write and keeps the state
readable by any batch consumer without a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from querysight_spark.plans.patterns import aggregate_patterns, merge_patterns
from querysight_spark.schemas import QUERY_LOG_SCHEMA


def stream_query_logs(
    spark: SparkSession,
    input_dir: str,
    schema=QUERY_LOG_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """I1: file-source stream over an append-only query-log directory.

    The schema must be supplied (streaming sources don't infer);
    ``maxFilesPerTrigger`` bounds micro-batch size for backpressure."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def windowed_pattern_counts(
    logs: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """I4: tumbling event-time windows with an explicit allowed-lateness
    watermark — rows later than ``watermark`` behind the max seen event
    time are dropped and their windows finalized (the reference has no
    late-data story; it re-reads the whole window instead)."""
    return (
        logs.withWatermark("query_start_time", watermark)
        .groupBy(
            F.window("query_start_time", window_duration).alias("win"),
            F.col("normalized_query"),
        )
        .agg(
            F.count(F.lit(1)).alias("frequency"),
            F.sum("query_duration_ms").alias("total_duration_ms"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "normalized_query",
            "frequency",
            "total_duration_ms",
        )
    )


def streaming_exact_dedup(
    logs: DataFrame,
    key_cols: list[str] | None = None,
    time_col: str = "query_start_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key arriving
    within the watermark horizon (``dropDuplicatesWithinWatermark`` keeps
    per-key state only until the watermark passes — bounded state, unlike
    a plain ``dropDuplicates`` on a stream which remembers keys forever).
    Default key = ``query_id``, the log's natural event id."""
    keys = list(key_cols) if key_cols else ["query_id"]
    return logs.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def start_incremental_merge(
    logs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    min_frequency: int = 1,
    extract_from_sql: bool = False,
    trigger_available_now: bool = True,
):
    """I2: maintain incremental pattern state via ``foreachBatch``.

    Each micro-batch is aggregated to patterns and written to
    ``state_dir/batch_id=<epoch>``. Epoch replay after a failure overwrites
    the same path — idempotent, unlike the reference's double-counting
    merge (fidelity F9). Returns the started StreamingQuery; callers
    ``awaitTermination`` it.
    """

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        pats = aggregate_patterns(
            batch_df,
            min_frequency=min_frequency,
            extract_from_sql=extract_from_sql,
        )
        pats.write.mode("overwrite").parquet(f"{state_dir}/batch_id={epoch_id}")

    writer = logs.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_pattern_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged view over all batch partitions: one re-aggregation keyed by
    (pattern_id, normalized_query), identical semantics to
    plans.patterns.merge_patterns over N inputs."""
    state = spark.read.option("basePath", state_dir).parquet(f"{state_dir}/batch_id=*")
    state = state.drop("batch_id")
    return merge_patterns(state, state.limit(0))


def compact_pattern_state(spark: SparkSession, state_dir: str, out_dir: str) -> None:
    """Compact N batch partitions into one snapshot (run periodically so
    the read-side union stays bounded)."""
    read_pattern_state(spark, state_dir).write.mode("overwrite").parquet(out_dir)


def start_rollup_absorb(
    events: DataFrame,
    tier_path: str,
    checkpoint_dir: str,
    time_col: str,
    value_col: str,
    every: str = "1 hour",
    group_cols: list[str] | None = None,
    partition_granularity: str = "day",
):
    """Streaming absorption into a persisted rollup tier (the hypertable
    maintenance loop at 100 TB), journal-style so micro-batch REPLAY is
    safe: each batch's partial rollup is first staged to
    ``tier_path/_partials/batch_id=<epoch>`` (dynamic partition overwrite
    keyed by the epoch — re-running the epoch rewrites the SAME partition
    with the same content, never appends), then the calendar chunks the
    batch touches are REBUILT from all staged partials overlapping those
    dates and upserted into the tier. The tier is thus a pure function of
    the journal: a crash between stage and rebuild, or a foreachBatch
    re-invocation (at-least-once semantics), re-derives identical chunk
    contents instead of double-counting — the same reason
    ``start_incremental_merge`` keys its state by epoch. A naive
    read-tier-merge-write here would add the replayed batch twice.

    History chunks the batch doesn't touch are never read or rewritten;
    the rebuild reads partials partition-pruned to the touched dates.
    Partials accumulate one small file set per (epoch, chunk) — the
    journal a compaction job can fold once its epochs are final (the
    ``compact_pattern_state`` analog), bounded by batches × patterns,
    not raw rows. The underscore prefix keeps Spark's readers from
    treating the journal as tier data. Returns the started
    StreamingQuery."""
    import os

    from querysight_spark.operators.rollup import time_rollup, upsert_rollup_tier

    groups = list(group_cols or [])

    def _absorb(batch_df: DataFrame, epoch_id: int) -> None:
        absorb_rollup_batch(
            batch_df, epoch_id, tier_path, time_col, value_col,
            every, groups, partition_granularity,
        )

    return (
        events.writeStream.foreachBatch(_absorb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def absorb_rollup_batch(
    batch_df: DataFrame,
    epoch_id: int,
    tier_path: str,
    time_col: str,
    value_col: str,
    every: str = "1 hour",
    group_cols: list[str] | None = None,
    partition_granularity: str = "day",
) -> None:
    """One epoch of the journal-style absorb (module-level so replay
    semantics are directly testable). Idempotency is per (checkpoint,
    epoch): Spark's contract is that a re-invoked epoch carries the same
    data, and the stage step rewrites exactly that epoch's partitions.
    Pointing a NEW stream (fresh checkpoint, epoch ids restarting at 0)
    at an existing journal is operator error, as with any journal."""
    import os

    from querysight_spark.operators.rollup import time_rollup, upsert_rollup_tier

    groups = list(group_cols or [])
    partials_path = os.path.join(tier_path, "_partials")
    spark = batch_df.sparkSession
    new = time_rollup(batch_df, time_col, value_col, every, groups)
    staged = new.withColumn(
        "p_date",
        F.date_trunc(partition_granularity, F.col("bucket_start")).cast("date"),
    ).withColumn("batch_id", F.lit(int(epoch_id)))
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        staged.write.mode("overwrite").partitionBy("batch_id", "p_date").parquet(
            partials_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    touched = new.select(
        F.date_trunc(partition_granularity, F.col("bucket_start"))
        .cast("date")
        .alias("p_date")
    ).distinct()
    rebuilt = (
        spark.read.parquet(partials_path)
        .join(F.broadcast(touched), "p_date")  # partition-pruned journal read
        .groupBy("bucket_start", *groups)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
        )
    )
    upsert_rollup_tier(rebuilt, tier_path, partition_granularity)
