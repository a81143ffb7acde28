"""Round-5 invariants: cache hygiene of the iterative/persisted operators
(the r4 ADVICE finding — explicit persists that outlive their operator
accumulate in a long-lived gate session until LRU pressure).

``localCheckpoint`` REGISTERS in the persistent-RDD registry too, but
its blocks are released by the ContextCleaner as soon as the result
DataFrame is garbage-collected — unlike the old explicit persists, which
had no owner after the operator returned. So the observable invariant is
BOUNDED growth (exactly the documented result/stream checkpoints, each
collectable), not zero growth; zero growth is asserted where an operator
returns driver-local data (BPE's merge rows)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_iterative_operators_release_internal_caches(spark):
    """pagerank/personalized_pagerank each persisted e + deg(+ sd) + every
    iterate before the fix (3-4 unreclaimable entries per call, growing
    with iterations); now each leaves exactly its one checkpointed
    result. bpe_merge_steps persisted words + one frame per merge step;
    now it unpersists everything (driver-local output) — zero growth."""
    from querysight_spark.operators.graph import (
        pagerank,
        personalized_pagerank,
        symmetrize,
    )
    from querysight_spark.operators.textstats import bpe_merge_steps

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 23) for i in range(23)], "src long, dst long"
    )
    sym = symmetrize(edges)

    before = _n_persistent_rdds(spark)
    pr = pagerank(sym, iterations=3)
    pr.collect()
    assert _n_persistent_rdds(spark) <= before + 1  # the result checkpoint

    before = _n_persistent_rdds(spark)
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    ppr = personalized_pagerank(sym, seeds, iterations=3)
    ppr.collect()
    assert _n_persistent_rdds(spark) <= before + 1

    before = _n_persistent_rdds(spark)
    docs = spark.createDataFrame(
        [(i, "low lower lowest newer new") for i in range(4)],
        "doc_id long, text string",
    )
    bpe_merge_steps(docs, n_merges=2).collect()
    assert _n_persistent_rdds(spark) == before  # nothing left behind at all


def test_checkpointed_streams_are_collectable(spark):
    """collocations/span-removal switched their heavy streams from
    persist to localCheckpoint: once the results are dropped, a GC cycle
    must actually drain the registry back to (at or below) its starting
    size — the property the old persists lacked."""
    import gc
    import time

    from querysight_spark.operators.search import collocations
    from querysight_spark.operators.textstats import remove_duplicate_spans

    def _drain_to(target: int, seconds: float) -> int:
        deadline = time.time() + seconds
        n = _n_persistent_rdds(spark)
        while n > target and time.time() < deadline:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            n = _n_persistent_rdds(spark)
        return n

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j k l") for i in range(6)],
        "doc_id long, text string",
    )
    # in a full-suite session earlier tests' collectable checkpoints may
    # still be mid-drain — settle to a STABLE floor (two consecutive
    # equal readings), not necessarily zero, before measuring; a fixed
    # 20 s target-0 wait read an inflated floor under full-suite load
    # and then flaked on the 60 s drain budget
    before = _drain_to(0, 30)
    stable = _drain_to(before - 1, 10) if before else 0
    before = min(before, stable) if before else 0
    collocations(docs, min_count=2, k=5).collect()
    remove_duplicate_spans(docs, n=4).collect()
    # results are unreferenced now; nudge both collectors and wait for
    # the async ContextCleaner to drain our two checkpoints back out
    assert _drain_to(before, 120) <= before


def test_ks_drift_cache_is_collectable(spark):
    """ks_drift held a session-lived persist on its distinct-value table
    (r5 ADVICE); now a localCheckpoint, so after the result is dropped a
    GC cycle drains the registry back to its starting floor."""
    import gc
    import time

    from querysight_spark.operators.quality import ks_drift

    def _drain_to(target: int, seconds: float) -> int:
        deadline = time.time() + seconds
        n = _n_persistent_rdds(spark)
        while n > target and time.time() < deadline:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            n = _n_persistent_rdds(spark)
        return n

    df = spark.createDataFrame(
        [(float(i % 13), "a" if i % 2 else "b") for i in range(60)],
        "v double, g string",
    )
    before = _drain_to(0, 20)
    ks_drift(df, "v", "g", "a", "b").collect()
    assert _drain_to(before, 60) <= before
