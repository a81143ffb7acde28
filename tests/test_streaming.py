"""Structured Streaming incremental pattern state (streaming.incremental):
file-source stream → foreachBatch merge, idempotency on epoch replay,
windowed counts with watermark. SURVEY §2.I — the reference's batch poller
(utils/cache_manager.py:591-607) double-counts re-runs; this path must not."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from querysight_spark.plans.patterns import aggregate_patterns
from querysight_spark.schemas import QUERY_LOG_SCHEMA
from querysight_spark.streaming import (
    compact_pattern_state,
    read_pattern_state,
    start_incremental_merge,
    stateful_pattern_counts,
    stream_query_logs,
    streaming_exact_dedup,
    windowed_pattern_counts,
)


def _log_rows(ids, norm, day):
    return [
        (f"q{i}", f"SELECT {i}", norm, "SELECT", "alice",
         dt.datetime(2024, 1, day, i % 24), 100.0 * (i + 1), 10, 100, 1, 8, 64,
         "main", ["main"], ["orders"], [])
        for i in ids
    ]


@pytest.fixture()
def dirs(tmp_path):
    return {
        "input": str(tmp_path / "logs"),
        "state": str(tmp_path / "state"),
        "chk": str(tmp_path / "chk"),
        "compact": str(tmp_path / "compact"),
    }


def _run_stream(spark, dirs):
    stream = stream_query_logs(spark, dirs["input"])
    q = start_incremental_merge(stream, dirs["state"], dirs["chk"])
    q.awaitTermination(120)
    assert not q.isActive


def test_incremental_merge_matches_batch(spark, dirs):
    batch1 = spark.createDataFrame(_log_rows(range(4), "pat_a", 3), QUERY_LOG_SCHEMA)
    batch1.write.mode("append").parquet(dirs["input"])
    _run_stream(spark, dirs)

    batch2 = spark.createDataFrame(_log_rows(range(4, 10), "pat_b", 4), QUERY_LOG_SCHEMA)
    batch2.write.mode("append").parquet(dirs["input"])
    _run_stream(spark, dirs)  # resumes from checkpoint: only new files processed

    state = read_pattern_state(spark, dirs["state"])
    expected = aggregate_patterns(
        batch1.unionByName(batch2), min_frequency=1, extract_from_sql=False
    )
    got = {r.normalized_query: r for r in state.collect()}
    want = {r.normalized_query: r for r in expected.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].frequency == want[k].frequency
        assert got[k].total_duration_ms == pytest.approx(want[k].total_duration_ms)
        assert got[k].first_seen == want[k].first_seen
        assert got[k].last_seen == want[k].last_seen
        assert got[k].users == want[k].users


def test_epoch_replay_is_idempotent(spark, dirs):
    batch = spark.createDataFrame(_log_rows(range(5), "pat_a", 3), QUERY_LOG_SCHEMA)
    batch.write.mode("append").parquet(dirs["input"])
    _run_stream(spark, dirs)
    before = read_pattern_state(spark, dirs["state"]).collect()

    # simulate epoch replay after checkpoint loss: same data, fresh checkpoint
    # → same batch_id partition overwritten, state unchanged (the reference
    # would double frequency here — fidelity F9)
    import shutil

    shutil.rmtree(dirs["chk"])
    _run_stream(spark, dirs)
    after = read_pattern_state(spark, dirs["state"]).collect()
    assert sorted(r.normalized_query for r in after) == sorted(
        r.normalized_query for r in before
    )
    assert {r.normalized_query: r.frequency for r in after} == {
        r.normalized_query: r.frequency for r in before
    }


def test_streaming_dedup_drops_redelivery(spark, dirs):
    rows = _log_rows(range(4), "pat_a", 3)
    dup = spark.createDataFrame(rows + rows[:2], QUERY_LOG_SCHEMA)  # q0/q1 twice
    dup.write.mode("append").parquet(dirs["input"])
    stream = stream_query_logs(spark, dirs["input"])
    got = []
    q = (
        streaming_exact_dedup(stream, watermark="2 days")
        .writeStream.foreachBatch(lambda bdf, _e: got.extend(bdf.collect()))
        .option("checkpointLocation", dirs["chk"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r.query_id for r in got)
    assert ids == ["q0", "q1", "q2", "q3"]  # re-deliveries dropped


def test_compaction_preserves_state(spark, dirs):
    batch = spark.createDataFrame(
        _log_rows(range(6), "pat_a", 3) + _log_rows(range(6, 9), "pat_b", 5),
        QUERY_LOG_SCHEMA,
    )
    batch.write.mode("append").parquet(dirs["input"])
    _run_stream(spark, dirs)
    compact_pattern_state(spark, dirs["state"], dirs["compact"])
    compacted = {r.normalized_query: r.frequency
                 for r in spark.read.parquet(dirs["compact"]).collect()}
    live = {r.normalized_query: r.frequency
            for r in read_pattern_state(spark, dirs["state"]).collect()}
    assert compacted == live


def test_stateful_counts_accumulate_across_runs(spark, dirs):
    batch1 = spark.createDataFrame(_log_rows(range(4), "pat_a", 3), QUERY_LOG_SCHEMA)
    batch1.write.mode("append").parquet(dirs["input"])

    def run():
        # memory sink can't recover from a checkpoint; foreachBatch can —
        # collect the update-mode rows driver-side per run
        got: dict[str, object] = {}
        stream = stream_query_logs(spark, dirs["input"])
        q = (
            stateful_pattern_counts(stream)
            .writeStream.foreachBatch(
                lambda bdf, _eid: got.update(
                    {r.normalized_query: r for r in bdf.collect()}
                )
            )
            .outputMode("update")
            .option("checkpointLocation", dirs["chk"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    r1 = run()
    assert r1["pat_a"].frequency == 4
    assert r1["pat_a"].total_duration_ms == pytest.approx(100.0 * (1 + 2 + 3 + 4))

    # second run resumes from the checkpoint: state store carries the prior
    # counts, only the new file is read
    batch2 = spark.createDataFrame(
        _log_rows(range(4, 10), "pat_a", 4) + _log_rows(range(3), "pat_b", 5),
        QUERY_LOG_SCHEMA,
    )
    batch2.write.mode("append").parquet(dirs["input"])
    r2 = run()
    assert r2["pat_a"].frequency == 10  # 4 carried in state + 6 new
    assert r2["pat_b"].frequency == 3
    assert r2["pat_a"].first_seen == dt.datetime(2024, 1, 3, 0)
    assert r2["pat_a"].last_seen == dt.datetime(2024, 1, 4, 9)


def test_windowed_counts_with_watermark(spark, dirs):
    rows = _log_rows(range(3), "pat_a", 3)
    spark.createDataFrame(rows, QUERY_LOG_SCHEMA).write.mode("append").parquet(
        dirs["input"]
    )
    stream = stream_query_logs(spark, dirs["input"])
    windowed = windowed_pattern_counts(stream, "1 hour", "1 day")
    # complete mode: every window in the result table (append mode would
    # emit only watermark-finalized windows — none within a single
    # availableNow batch, since the watermark advances between batches)
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", dirs["chk"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT * FROM win_counts ORDER BY window_start"
    ).collect()
    assert all(r.normalized_query == "pat_a" for r in out)
    assert len(out) == 3  # one tumbling 1h window per event in the fixture
    assert all(r.frequency == 1 for r in out)
    assert all((r.window_end - r.window_start).total_seconds() == 3600 for r in out)


def test_rollup_absorb_replay_is_idempotent(spark, tmp_path):
    """Code-review r3 finding: foreachBatch is at-least-once — a replayed
    epoch must NOT double-count. The journal design stages each epoch's
    partial into its own batch_id partition (overwrite) and rebuilds
    touched chunks from the journal, so re-running an epoch re-derives
    identical tier contents."""
    import datetime as dt

    from querysight_spark.operators.rollup import time_rollup
    from querysight_spark.streaming.incremental import absorb_rollup_batch

    rows = [(dt.datetime(2024, 1, 1 + d, h), float(d * 100 + h), f"t{h % 2}")
            for d in range(2) for h in range(4)]
    df = spark.createDataFrame(rows, "ts timestamp, value double, g string")
    b0 = df.where("day(ts) = 1")
    b1 = df.where("day(ts) = 2")
    tier = str(tmp_path / "tier")

    def snap():
        return sorted(
            tuple(r) for r in spark.read.parquet(tier)
            .select("bucket_start", "g", "n", "sum", "min", "max").collect()
        )

    absorb_rollup_batch(b0, 0, tier, "ts", "value", "1 hour", ["g"])
    absorb_rollup_batch(b1, 1, tier, "ts", "value", "1 hour", ["g"])
    once = snap()
    absorb_rollup_batch(b1, 1, tier, "ts", "value", "1 hour", ["g"])  # replay
    absorb_rollup_batch(b0, 0, tier, "ts", "value", "1 hour", ["g"])  # replay
    assert snap() == once
    want = sorted(
        tuple(r) for r in time_rollup(df, "ts", "value", "1 hour", ["g"])
        .select("bucket_start", "g", "n", "sum", "min", "max").collect()
    )
    assert once == want


def test_session_absorb_merges_cross_batch_and_replay_idempotent(spark, tmp_path):
    """st06's core (VERDICT r3 ask #3): session state absorbed into a
    persisted tier must (a) MERGE sessions whose events straddle the
    micro-batch boundary — sessions are not additive, so the rebuild is
    an interval merge, not a sum — and (b) survive epoch replay without
    splitting or double-counting, mirroring the rollup-absorb case."""
    import datetime as dt

    from querysight_spark.streaming.incremental import absorb_session_batch

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: events alternate between batches, 10 min apart — ONE
        # session only if cross-batch merging works (gap 30 min)
        (1, t0 + 0 * m, 0), (1, t0 + 10 * m, 1), (1, t0 + 20 * m, 0),
        (1, t0 + 30 * m, 1),
        # user 1 again ≥30 min later: second session, single-batch
        (1, t0 + 90 * m, 0),
        # user 2: one event per batch, 40 min apart — must stay TWO sessions
        (2, t0 + 0 * m, 0), (2, t0 + 40 * m, 1),
    ]
    df = spark.createDataFrame(
        [(u, ts) for u, ts, _b in rows], "user_id bigint, ts timestamp"
    )
    b0 = spark.createDataFrame(
        [(u, ts) for u, ts, b in rows if b == 0], "user_id bigint, ts timestamp"
    )
    b1 = spark.createDataFrame(
        [(u, ts) for u, ts, b in rows if b == 1], "user_id bigint, ts timestamp"
    )
    tier = str(tmp_path / "tier")

    def snap():
        return sorted(
            tuple(r) for r in spark.read.parquet(tier)
            .select("user_id", "session_start", "session_end", "n_events")
            .collect()
        )

    absorb_session_batch(b0, 0, tier, "ts", "user_id", "30 minutes")
    absorb_session_batch(b1, 1, tier, "ts", "user_id", "30 minutes")
    once = snap()
    # one-shot batch sessionization is the truth
    want = sorted(
        tuple(r) for r in df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
        .collect()
    )
    assert once == want
    assert [r[:1] + r[3:] for r in once] == [
        (1, 4), (1, 1), (2, 1), (2, 1)  # merged 4-event session + 3 others
    ]
    # at-least-once replay, out of order — tier must not change
    absorb_session_batch(b1, 1, tier, "ts", "user_id", "30 minutes")
    absorb_session_batch(b0, 0, tier, "ts", "user_id", "30 minutes")
    assert snap() == once


def test_stateful_anomalies_cross_batch_state(spark, tmp_path):
    """Two time-ordered files drained as SEPARATE micro-batches: the
    spike in file 2 must be judged against history accumulated from
    file 1 — then the whole stream must equal the batch operator."""
    import datetime as dt

    from querysight_spark.operators.timeseries import trailing_anomalies
    from querysight_spark.streaming.stateful import stateful_anomalies

    def _rows(lo, hi, spike_at=None):
        out = []
        for i in range(lo, hi):
            v = 500.0 if i == spike_at else 10.0 + (i % 3)
            out.append((i, dt.datetime(2024, 1, 1, 0, i), 1, "view", v))
        return out

    src = str(tmp_path / "src")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batch1 = spark.createDataFrame(_rows(0, 8), schema)
    batch2 = spark.createDataFrame(_rows(8, 16, spike_at=12), schema)
    batch1.coalesce(1).write.parquet(src + "/f1")
    batch2.coalesce(1).write.parquet(src + "/f2")
    import glob, shutil

    stage = str(tmp_path / "stage")
    import os

    os.makedirs(stage)
    # the file source orders batches by MODIFICATION TIME, not name — two
    # files copied in the same millisecond tie-break nondeterministically,
    # so pin strictly increasing mtimes to make batch order (f1, f2)
    import time

    shutil.copy(glob.glob(src + "/f1/*.parquet")[0], stage + "/a.parquet")
    shutil.copy(glob.glob(src + "/f2/*.parquet")[0], stage + "/b.parquet")
    now = time.time()
    os.utime(stage + "/a.parquet", (now - 60, now - 60))
    os.utime(stage + "/b.parquet", (now, now))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stateful_anomalies(stream)
        .writeStream.format("memory")
        .queryName("anom_x")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (r.event_id, r.n_history)
        for r in spark.table("anom_x").orderBy("event_id").collect()
    ]
    batch_truth = trailing_anomalies(
        batch1.unionByName(batch2)
    ).select("event_id", "n_history").orderBy("event_id").collect()
    assert got == [(r.event_id, r.n_history) for r in batch_truth]
    # the spike sits in batch 2 but its 12-row history spans batch 1
    assert got == [(12, 12)]


def test_stateful_topk_cross_batch_eviction(spark, tmp_path):
    """Batch 1 fills the leaderboard; batch 2's faster-arriving slower
    queries must EVICT batch-1 members from state — then the collapsed
    stream equals the whole-data batch top-k."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F
    from querysight_spark.streaming.stateful import stateful_topk

    schema = (
        "normalized_query string, query_id long, query_duration_ms double"
    )
    b1 = spark.createDataFrame(
        [("q", 1, 10.0), ("q", 2, 20.0), ("q", 3, 30.0)], schema
    )
    # 40/50 must push out 10/20; duplicate redelivery of id 3 must NOT
    # occupy two slots
    b2 = spark.createDataFrame(
        [("q", 4, 40.0), ("q", 5, 50.0), ("q", 3, 30.0)], schema
    )
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    shutil.copy(glob.glob(src + "/f1/*.parquet")[0], stage + "/a.parquet")
    shutil.copy(glob.glob(src + "/f2/*.parquet")[0], stage + "/b.parquet")
    now = time.time()
    os.utime(stage + "/a.parquet", (now - 60, now - 60))
    os.utime(stage + "/b.parquet", (now, now))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stateful_topk(stream, k=3)
        .writeStream.format("memory")
        .queryName("topk_x")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("topk_x")
    # the final leaderboard via the monotone collapse
    from pyspark.sql import Window

    w = Window.partitionBy("normalized_query").orderBy(
        F.col("query_duration_ms").desc(), F.col("query_id")
    )
    final = (
        out.select("normalized_query", "query_id", "query_duration_ms")
        .distinct()
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .orderBy("rnk")
        .collect()
    )
    assert [(r.query_id, r.query_duration_ms) for r in final] == [
        (5, 50.0), (4, 40.0), (3, 30.0)
    ]
    # batch-2's own emission already shows the eviction (state, not
    # collapse artifact): its rows are exactly the final leaderboard
    last = out.where(F.col("query_id").isin([5])).count()
    assert last == 1


def test_drift_monitor_detects_shift_and_passes_identical(spark):
    """st11's parts in isolation: identical observed/reference
    distributions must not alarm; a gross location shift must. The
    bucket-count frame is the same plan in batch and streaming (groupBy
    bucket), so the decision logic is testable without a stream."""
    from querysight_spark.streaming.incremental import (
        drift_from_counts,
        reference_histogram,
        stream_drift_bucket_counts,
    )

    ref = spark.createDataFrame(
        [(float(i % 100),) for i in range(2000)], "value double"
    )
    edges, ref_counts, n_ref = reference_histogram(ref, "value", n_bins=16)
    assert len(edges) == 15 and n_ref == 2000
    assert sum(ref_counts.values()) == 2000

    same = drift_from_counts(
        stream_drift_bucket_counts(ref, edges), ref_counts, n_ref
    ).first()
    assert same.n_obs == 2000 and same.n_ref == 2000
    assert same.ks_stat <= same.critical and not same.drift

    shifted = spark.createDataFrame(
        [(float(i % 100) + 50.0,) for i in range(2000)], "value double"
    )
    alarm = drift_from_counts(
        stream_drift_bucket_counts(shifted, edges), ref_counts, n_ref
    ).first()
    assert alarm.drift and alarm.ks_stat > alarm.critical
    # a stream that saw nothing yet: null read-out (nullif-guarded ANSI
    # division), never an alarm and never an ArithmeticException
    empty = spark.createDataFrame([], "value double")
    z = drift_from_counts(
        stream_drift_bucket_counts(empty, edges), ref_counts, n_ref
    ).first()
    assert z.n_obs == 0 and z.ks_stat is None and z.drift is not True


def test_stateful_anomalies_vectorized_matches_batch_exactly(spark, tmp_path):
    """r14 pin for the vectorized scorer: multi-user seeded data drained
    as two micro-batches (so steady-state windows, growing-head windows,
    AND carried-ring state all exercise the sliding_window_view path)
    must equal the batch window operator on EVERY column, exactly."""
    import datetime as dt
    import glob
    import os
    import random
    import shutil
    import time

    from querysight_spark.operators.timeseries import trailing_anomalies
    from querysight_spark.streaming.stateful import stateful_anomalies

    rng = random.Random(1409)
    rows = []
    i = 0
    for u in range(7):
        for j in range(60):  # 60 > lookback: growing head + steady state
            v = rng.uniform(5.0, 15.0)
            if j in (11, 37, 52):  # spikes in both halves of the stream
                v += rng.choice([80.0, -80.0])
            rows.append((i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                         u, "view", round(v, 2)))
            i += 1
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    half = len(rows) // 2
    df = spark.createDataFrame(rows, schema)
    b1 = spark.createDataFrame(rows[:half], schema)
    b2 = spark.createDataFrame(rows[half:], schema)
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    for name, b in (("a", b1), ("b", b2)):
        d = str(tmp_path / name)
        b.coalesce(1).write.parquet(d)
        shutil.copy(glob.glob(d + "/*.parquet")[0], f"{stage}/{name}.parquet")
    now = time.time()
    os.utime(stage + "/a.parquet", (now - 60, now - 60))
    os.utime(stage + "/b.parquet", (now, now))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stateful_anomalies(stream)
        .writeStream.format("memory")
        .queryName("anom_vec")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cols = ["user_id", "ts", "event_id", "value", "trailing_mean",
            "trailing_std", "n_history", "zscore"]
    got = [tuple(r) for r in
           spark.table("anom_vec").select(cols).orderBy("event_id").collect()]
    want = [tuple(r) for r in
            trailing_anomalies(df).select(cols).orderBy("event_id").collect()]
    assert len(got) >= 10  # the fixture must actually flag anomalies
    assert got == want
