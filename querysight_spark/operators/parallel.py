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

from pyspark.sql import DataFrame


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
