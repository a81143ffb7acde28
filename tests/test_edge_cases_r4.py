"""Edge-case robustness for the round-4 operator families: empty inputs,
no-match queries, degenerate parameters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from querysight_spark.operators.search import (
    bm25_topk,
    tfidf_scores,
    unigram_lm_scores,
)


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        ["doc_id", "text"],
    )


def test_bm25_no_matching_terms(small):
    assert bm25_topk(small, ["nosuchterm"], k=5).count() == 0


def test_tfidf_no_matching_terms(small):
    assert tfidf_scores(small, ["nosuchterm"]).count() == 0


def test_unigram_lm_single_doc(spark):
    df = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    got = unigram_lm_scores(df).collect()[0]
    # p(a)=2/3, p(b)=1/3; mean over 3 tokens
    import math

    expect = (2 * math.log(2 / 3) + math.log(1 / 3)) / 3
    assert got.mean_logprob == pytest.approx(expect, abs=1e-6)


def test_stratified_sample_zero_quota(small):
    from querysight_spark.operators.textstats import stratified_sample

    df = small.withColumn("src", F.lit("s"))
    assert stratified_sample(df, ["src"], 0).count() == 0


def test_cluster_assign_single_centroid(spark):
    from querysight_spark.operators.clustering import cluster_assign

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "raw"]
    ).select("vec_id", F.transform("raw", lambda x: x.cast("float")).alias("embedding"))
    cents = spark.createDataFrame([(9, [1.0, 0.0])], ["cid", "raw"]).select(
        "cid", F.transform("raw", lambda x: x.cast("float")).alias("cvec")
    )
    got = {r.vec_id: r.cluster_id for r in cluster_assign(vecs, cents).collect()}
    assert got == {1: 9, 2: 9}  # everything lands in the only cluster


def test_dup_span_coverage_all_unique(spark):
    from querysight_spark.operators.textstats import dup_span_coverage

    df = spark.createDataFrame(
        [(1, " ".join(f"u{i}" for i in range(20))),
         (2, " ".join(f"v{i}" for i in range(20)))],
        ["doc_id", "text"],
    )
    got = dup_span_coverage(df, n=8).collect()
    assert all(r.covered_tokens == 0 and r.dup_coverage == 0.0 for r in got)


def test_upsample_epochs_zero(spark):
    from querysight_spark.operators.textstats import upsample_epochs

    df = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    assert upsample_epochs(df, 0.0).count() == 0


def test_interval_overlap_disjoint_keys(spark):
    import datetime as dt

    from querysight_spark.operators.rangejoin import interval_overlap_join

    t0, t1 = dt.datetime(2024, 1, 1, 1), dt.datetime(2024, 1, 1, 2)
    a = spark.createDataFrame(
        [("A", "k1", t0, t1)],
        "a_id string, key string, a_start timestamp, a_end timestamp",
    )
    b = spark.createDataFrame(
        [("B", "k2", t0, t1)],
        "b_id string, key string, b_start timestamp, b_end timestamp",
    )
    assert interval_overlap_join(
        a, b, ["key"], "a_start", "a_end", "b_start", "b_end"
    ).count() == 0


def test_asof_forward_empty_right(spark):
    import datetime as dt

    from querysight_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("L", "k", dt.datetime(2024, 1, 1))],
        "lid string, key string, lt timestamp",
    )
    right = spark.createDataFrame(
        [], "rid string, key string, rt timestamp, v double"
    )
    out = asof_join(
        left, right, on=["key"], left_time="lt", right_time="rt",
        right_values=["rid", "v"], direction="forward",
    ).collect()
    assert len(out) == 1 and out[0].rid_asof is None


# --- round-4b family edge cases ---------------------------------------------


def test_gap_fill_empty_input_is_empty(spark):
    from querysight_spark.operators.timeseries import (
        gap_fill_forward,
        gap_fill_linear,
        resample_hourly,
    )

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    hourly = resample_hourly(ev)
    assert gap_fill_forward(hourly).count() == 0
    assert gap_fill_linear(hourly.drop("n_events")).count() == 0


def test_pagerank_empty_edges_raises(spark):
    import pytest

    from querysight_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(empty)


def test_fuzzy_pairs_null_names_and_blocks_drop(spark):
    from pyspark.sql import functions as F

    from querysight_spark.operators.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [(1, None, "b"), (2, "x", "b"), (3, "x", None), (4, "x", "b")],
        "id long, name string, zip string",
    )
    out = blocked_fuzzy_pairs(df, "id", "name", F.col("zip"), 2).collect()
    # null name -> null distance -> filtered; null block never joins
    assert {(r.id_a, r.id_b) for r in out} == {(2, 4)}


def test_funnel_unreachable_stage_counts_zero(spark):
    import datetime as dt

    from querysight_spark.operators.behavior import funnel

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "signup")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {r.stage: r for r in funnel(ev, ["signup", "purchase"]).collect()}
    assert out["signup"].n_users == 1
    assert out["purchase"].n_users == 0
    assert out["purchase"].conv_from_first == 0.0


def test_wma_all_null_values_yield_null_not_crash(spark):
    from querysight_spark.operators.timeseries import weighted_moving_average

    ev = spark.createDataFrame(
        [(1, None), (2, None)],
        "event_id long, value double",
    ).selectExpr(
        "event_id", "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,event_id) AS ts",
        "1 AS user_id", "value"
    )
    rows = weighted_moving_average(ev, [0.5, 0.5]).collect()
    # 0/0 division: wma is NaN/NULL-ish, never an exception; values stay null
    assert len(rows) == 2
