from __future__ import annotations

"""Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter).

At 100 TB the win is semi-join reduction BEFORE the shuffle: a selective
filter on the dimension side is turned into a bloom filter that prunes
fact rows at the scan, so the big side never shuffles rows that cannot
join. Nothing to implement — the engine's job is to (a) express joins
declaratively so the rule can fire and (b) know the thresholds: the
application-side scan must look > 10 GB by default (production-sized; a
local test must lower it), the creation side < 10 MB, and the join must
not already be broadcast."""

import pytest


@pytest.fixture()
def tuned(spark):
    keys = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"),
    ]
    old = {k: spark.conf.get(k) for k, _v in keys}
    for k, v in keys:
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def _join(spark, sf="/root/testdata/sf0.001"):
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf}/orders.parquet").where(
        "o_orderpriority = '1-URGENT'"
    )
    return li.join(o, li["l_orderkey"] == o["o_orderkey"])


def test_bloom_filter_fires_when_thresholds_match(tuned):
    j = _join(tuned).groupBy().count()
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan, plan
    assert "might_contain" in plan, plan


def test_bloom_filter_does_not_change_results(tuned, spark):
    with_bloom = _join(tuned).count()
    # turn the rule off entirely -> plain join baseline
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        baseline = _join(spark).count()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_bloom == baseline
    assert baseline > 0


def test_bloom_filter_silent_at_default_thresholds(spark):
    """The 10 GB application-side default is production-sized: on local
    test data the rule must NOT fire (same miss the AQE skew-split showed
    in tools/skew_bench.py) — knowing WHEN it's silent is the tuning
    knowledge this test pins."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = _join(spark).groupBy().count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
