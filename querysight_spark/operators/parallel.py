"""Parallelism floor for compute-dominated narrow sources.

The driver's testdata tables are single-file/single-row-group parquet,
so Spark scans them as ONE partition regardless of
``maxPartitionBytes`` (splitting is row-group-granular) — and any
per-row-compute-heavy stage sitting directly on such a scan runs on
1-2 cores, drifting with per-core scheduler noise that a wide JVM
calibration probe cannot see (the round-13 mm11/X200 class; round 14
measured the same signature on the shingle+md5 dedup paths: dd02
2.20 → 1.14 s, dd03 2.45 → 1.93 s at sf0.1 with the floor, while
scan-bound tx02/tx06 LOSE by the pure exchange cost — so the floor is
applied per measured call site, never blanket).

At 100 TB the guard is a no-op: file count >> cores, the plan is
already wider than the cluster, and no shuffle is added."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def coalesce_tiny_shuffles(spark):
    """Size-based AQE partition coalescing, scoped to an iterative
    fixpoint loop (graph rounds, closure walks).

    AQE's default ``coalescePartitions.parallelismFirst=true`` keeps
    post-shuffle partition counts at the cluster's parallelism for
    throughput — the right default for one big query, but inside a
    loop whose per-round frames are kilobytes it turns EVERY round's
    exchanges into <cores> micro-tasks whose scheduling overhead
    dominates the round (measured on the CC loop: ~2x wall-clock).
    Setting it false makes AQE coalesce toward
    ``advisoryPartitionSizeInBytes`` (64 MB default) instead — a
    scale-adaptive rule, not a local[32] constant: at 100 TB a round's
    shuffle exceeds the advisory size and keeps full width; only
    genuinely tiny rounds collapse to few tasks.

    The conf is session-scoped, so the scope must not span concurrent
    jobs from other threads that need parallelism-first; the graph
    loops below are single-threaded driver loops. Restored on exit."""
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def floor_parallelism(
    src: DataFrame, probe: DataFrame | None = None
) -> DataFrame:
    """Repartition ``src`` up to the cluster's parallelism when its
    plan is narrower — Connect-safely (ADVICE r13): the
    ``.rdd.getNumPartitions()`` probe is exact but forces a
    DataFrame→RDD plan conversion and does not exist under Spark
    Connect, so it runs only on a classic session; under Connect the
    floor comes from ``spark.sql.shuffle.partitions`` and the width
    from ``probe``'s (default: ``src``'s) input file count — an
    approximation that is exact for row-group-narrow sources and
    conservatively wide otherwise."""
    if probe is None:
        probe = src
    spark = probe.sparkSession
    try:  # classic session: exact plan width
        par = spark.sparkContext.defaultParallelism
        width = src.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no sparkContext / .rdd access
        par = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        try:
            width = len(probe.inputFiles()) or 1
        except Exception:
            width = 1
    if width < par:
        src = src.repartition(par)
    return src
