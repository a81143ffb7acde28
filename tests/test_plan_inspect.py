from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from querysight_spark.plans.inspect import assert_plan, plan_summary
from querysight_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_visible(spark):
    df = load_table(spark, "orders", SF).where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    s = assert_plan(df, n_scans=1, pushed_filters_contain="o_orderpriority")
    assert s["has_wholestage_codegen"]


def test_broadcast_join_detected(spark):
    li = load_table(spark, "lineitem", SF)
    nation = load_table(spark, "nation", SF)
    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    s = plan_summary(j)
    assert s["n_broadcasts"] >= 2
    assert s["n_broadcast_hash_joins"] >= 2


def test_groupby_costs_one_shuffle(spark):
    df = load_table(spark, "events", SF).groupBy("event_type").count()
    # collect() first so AQE finalizes the executed plan
    df.collect()
    s = plan_summary(df)
    assert s["n_shuffles"] == 1
    assert s["aqe_final"]


def test_assert_plan_failure_is_loud(spark):
    df = load_table(spark, "events", SF).select("event_id")
    with pytest.raises(AssertionError, match="n_scans"):
        assert_plan(df, n_scans=99)


def test_gap_fill_scans_raw_events_once(spark):
    """The hourly agg feeds both the span agg and the join probe; the
    persist inside gap_fill keeps the raw scan at the one cache fill
    (was 2 full executions with no ReusedExchange). n_scans counts
    re-executed scans OUTSIDE cache definitions, so the healthy shape
    is 0 re-executions + cached references."""
    from querysight_spark.operators.timeseries import (
        gap_fill_forward,
        resample_hourly,
    )

    ev = load_table(spark, "events", SF)
    out = gap_fill_forward(resample_hourly(ev))
    out.collect()
    s = plan_summary(out)
    assert s["n_scans"] <= 1
    assert s["n_cache_refs"] >= 1


def test_funnel_stage_filters_are_pushed(spark):
    from querysight_spark.operators.behavior import funnel

    ev = load_table(spark, "events", SF)
    out = funnel(ev, ["signup", "purchase"])
    out.collect()
    s = plan_summary(out)
    assert any("signup" in f for f in s["pushed_filters"])
    assert any("purchase" in f for f in s["pushed_filters"])


def test_funnel_and_retention_are_single_scan(spark):
    """The fold-based funnel and activity-derived cohort table read raw
    events ONCE (the join-chain formulations measured 6 and 3 scans)."""
    from querysight_spark.operators.behavior import cohort_retention, funnel

    ev = load_table(spark, "events", SF)
    f = funnel(ev, ["signup", "view", "click", "purchase"])
    f.collect()
    assert plan_summary(f)["n_scans"] <= 1
    c = cohort_retention(ev)
    c.collect()
    s = plan_summary(c)
    assert s["n_scans"] <= 1 and s["n_cache_refs"] >= 1


def test_session2_operators_scan_once(spark):
    """The round-4 session-2 operators share one materialized subtree per
    source: collocations' bigram stream has four consumers (pair/left/
    right/total), KS-drift's distinct-value table two (ECDF + totals),
    triangles' oriented edge set three (wedge + close) — each measured as
    multi-scan before the persist/checkpoint fixes."""
    from pyspark.sql import functions as F

    from querysight_spark.operators.graph import triangles
    from querysight_spark.operators.quality import ks_drift
    from querysight_spark.operators.search import collocations

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    c = collocations(docs, min_count=2, k=10)
    c.collect()
    s = plan_summary(c)
    # bigram-type counts are checkpointed (Scan ExistingRDD, not a file
    # re-scan) and the top-k tail is TakeOrderedAndProject — never a
    # single-partition global window (the r4 weak-plan finding). The one
    # allowed SinglePartition exchange is the 1-row n_bigrams scalar agg
    # (partials-sized, benign); a reintroduced global window would add a
    # second and drop the TakeOrdered.
    assert s["n_scans"] == 0
    assert s["n_take_ordered"] >= 1
    assert s["n_single_partition"] <= 1

    ev = load_table(spark, "events", SF).select("event_type", "value")
    k = ks_drift(ev, "value", "event_type", "purchase", "view")
    k.collect()
    s = plan_summary(k)
    # r6: the distinct-value table moved from a session-lived persist to
    # localCheckpoint (collectable — r5 ADVICE), so it reads back as Scan
    # ExistingRDD: zero FILE scans is the invariant, no cache ref expected
    assert s["n_scans"] == 0

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    t = triangles(pairs)
    t.collect()
    assert plan_summary(t)["n_scans"] == 0  # checkpointed edge set


def test_tpch_probe_plans_broadcast_dims_and_decorrelate(spark):
    """h-family plan shapes at test scale: every dim lands broadcast (no
    sort-merge joins on sf0.001), h18's IN-subquery plans as a semi join,
    and h17's correlated scalar subquery decorrelates into an aggregated
    join instead of a per-row re-scan."""
    from querysight_spark.probes import PROBES
    from querysight_spark.sources import register_views

    register_views(spark, SF)

    h05 = spark.sql(PROBES["h05_local_supplier_volume"][0])
    h05.collect()
    s = plan_summary(h05)
    assert s["n_broadcast_hash_joins"] >= 4 and s["n_sort_merge_joins"] == 0

    h18 = spark.sql(PROBES["h18_large_volume_customers"][0])
    h18.collect()
    plan = h18._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan

    h17 = spark.sql(PROBES["h17_small_quantity_revenue"][0])
    h17.collect()
    plan = h17._jdf.queryExecution().executedPlan().toString()
    assert "SubqueryExec" not in plan  # decorrelated, not re-executed per row
    assert plan_summary(h17)["n_broadcast_hash_joins"] >= 2


def test_sk04_heavy_hitters_topk_is_distributed(spark):
    """sk04's exact top-20 selection over the full unigram vocabulary must
    plan as TakeOrderedAndProject (per-partition top-k merged on the
    driver), never a single-partition row_number window — the r4 weak-plan
    finding. No SinglePartition exchange appears anywhere in sk04 (the
    sketch cells are a grouped agg, not a scalar one)."""
    from querysight_spark.extension_queries import EXTENSION_QUERIES

    fn, _oracle = EXTENSION_QUERIES["sk04_countmin_heavy_hitters"]
    df = fn(spark, SF)
    df.collect()
    s = plan_summary(df)
    assert s["n_take_ordered"] >= 1
    assert s["n_single_partition"] == 0


def test_h21_multi_exists_plan_has_no_cartesian(spark):
    """Q21's multi-(NOT-)EXISTS self-join pileup is the accidental-
    cartesian trap (r5 VERDICT warning): every correlation is stated as
    an l_orderkey equality, so the whole plan must be hash semi/anti
    joins — no CartesianProduct, and any nested-loop join must at least
    be broadcast (none expected here)."""
    from querysight_spark.probes import PROBES
    from querysight_spark.sources import register_views

    register_views(spark, SF)
    df = spark.sql(PROBES["h21_suppliers_kept_waiting"][0])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan
    s = plan_summary(df)
    assert s["n_broadcast_hash_joins"] + s["n_sort_merge_joins"] >= 5


def test_h02_correlated_min_decorrelates(spark):
    """Q2's correlated MIN must decorrelate into an aggregate + join —
    never a per-row subquery re-execution."""
    from querysight_spark.probes import PROBES
    from querysight_spark.sources import register_views

    register_views(spark, SF)
    df = spark.sql(PROBES["h02_min_cost_supplier"][0])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SubqueryExec" not in plan  # h17's decorrelation discipline
    assert plan_summary(df)["n_take_ordered"] >= 1  # LIMIT 100 distributed


def test_versioned_pruned_scan_plans_kept_files_only(spark, tmp_path):
    """io07's plan contract: a zone-map-pruned read must (a) plan fewer
    files than the snapshot holds — checked at the manifest level, where
    the planning actually happens — and (b) still push the residual
    BETWEEN down to the parquet scan."""
    from querysight_spark.sources.versioned import (
        pruned_files,
        read_version,
        write_version,
    )

    root = str(tmp_path / "t")
    df = spark.range(0, 20000).select(
        "id", (F.col("id") % 5).alias("g")
    )
    write_version(
        spark, df.repartitionByRange(8, "id"), root, stats_cols=["id"]
    )
    kept, skipped = pruned_files(root, 1, "id", 100, 2399)
    assert skipped and len(kept) <= 2  # ~an eighth of the key space
    scan = read_version(spark, root, prune=("id", 100, 2399))
    s = assert_plan(scan, pushed_filters_contain="id")
    assert s["n_scans"] == 1


def test_merge_into_is_one_shuffle_join_no_cartesian(spark, tmp_path):
    """wh03's plan shape: the merge itself is ONE full-outer join over
    the touched region — no nested-loop blowup, no re-executed scan —
    and the touched-file detection broadcasts the file-range table."""
    from querysight_spark.sources.versioned import (
        merge_into,
        read_manifest,
        write_version,
    )

    root = str(tmp_path / "t")
    base = spark.range(0, 20000).select("id", (F.col("id") * 2).alias("v"))
    write_version(
        spark, base.repartitionByRange(8, "id"), root, stats_cols=["id"]
    )
    src = spark.range(0, 200).select("id", F.lit(-1).alias("v"))
    merge_into(spark, src, root, ["id"])
    m = read_manifest(root, 2)
    # file pruning engaged: most files carried by reference
    assert len(m["removed"]) <= 2 and len(m["files"]) > len(m["added"])


def test_dedup_sink_lens_join_prunes_to_fingerprint_column(spark, tmp_path):
    """st15's lens anti-join must read ONLY the fingerprint column of
    the versioned table (column pruning through the manifest-planned
    scan), not the payload."""
    from querysight_spark.sources.versioned import read_version, write_version

    root = str(tmp_path / "t")
    rows = spark.range(0, 1000).select(
        "id",
        F.concat(F.lit("body-"), (F.col("id") % 100).cast("string")).alias(
            "body"
        ),
    ).withColumn("fp", F.md5("body"))
    write_version(spark, rows, root)
    batch = rows.where(F.col("id") < 50)
    lens = read_version(spark, root).select("fp")
    novel = batch.join(lens, on="fp", how="left_anti")
    plan = novel._jdf.queryExecution().executedPlan().toString()
    import re

    scans = re.findall(r"ReadSchema: struct<[^>]*>", plan)
    assert any("fp:string" in s and "body" not in s for s in scans)
