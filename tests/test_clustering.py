"""Unit tests for operators/clustering.py (nearest-centroid assignment +
SemDeDup). Oracle equivalence for cl01/cl02 is covered by
test_oracle_gate.py; these pin the semantics on a hand-built fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from querysight_spark.operators.clustering import cluster_assign, semantic_dedup


@pytest.fixture(scope="module")
def space(spark):
    # two tight clusters around the x and y axes plus one outlier
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0]),
        (3, [1.0, 0.001, 0.0]),   # near-dup of 1
        (10, [0.0, 1.0, 0.0]),
        (11, [0.1, 0.99, 0.0]),
        (20, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "raw"])
    return df.select(
        "vec_id", F.transform("raw", lambda x: x.cast("float")).alias("embedding")
    )


@pytest.fixture(scope="module")
def cents(spark):
    rows = [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, ["cid", "raw"])
    return df.select("cid", F.transform("raw", lambda x: x.cast("float")).alias("cvec"))


def test_cluster_assign(space, cents):
    got = {r.vec_id: r for r in cluster_assign(space, cents).collect()}
    assert {i: got[i].cluster_id for i in got} == {
        1: 100, 2: 100, 3: 100, 10: 200, 11: 200, 20: 100,
    }
    # the outlier (orthogonal to both) ties at cosine 0 -> smallest cid wins
    assert got[20].cosine == 0.0
    assert got[1].cosine == 1.0


def test_cluster_assign_zero_norm_vector_consistent(spark, cents):
    """r15 regression (ADVICE r14): a zero-norm vector has NaN cosine to
    every centroid; the bigint argmax encoding scored NaN as 0 while the
    separate max(cos) kept NaN — the (cluster_id, cosine) pair could
    disagree. With the nanvl guard both aggregates skip NaN consistently:
    an all-NaN vector returns NULLs, and normal vectors are unaffected."""
    rows = [(1, [0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "raw"]).select(
        "vec_id", F.transform("raw", lambda x: x.cast("float")).alias("embedding")
    )
    got = {r.vec_id: r for r in cluster_assign(df, cents).collect()}
    assert got[1].cluster_id is None and got[1].cosine is None
    assert got[2].cluster_id == 100 and got[2].cosine == 1.0


def test_semantic_dedup_marks_within_cluster_near_identicals(space, cents):
    got = {r.vec_id: r for r in semantic_dedup(space, cents, threshold=0.999).collect()}
    # 3 is near-identical to 1 within cluster 100 and has the larger id
    assert got[3].is_dup and not got[1].is_dup
    # 2 (cos ~0.995 to 1) is below the 0.999 bar; other cluster untouched
    assert not got[2].is_dup and not got[10].is_dup and not got[11].is_dup
    assert not got[20].is_dup
    assert len(got) == 6


def test_semantic_dedup_never_crosses_clusters(spark):
    # identical vectors forced into different clusters by construction
    # cannot mark each other
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    vecs = spark.createDataFrame(rows, ["vec_id", "raw"]).select(
        "vec_id", F.transform("raw", lambda x: x.cast("float")).alias("embedding")
    )
    cents = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.0, 1.0])], ["cid", "raw"]
    ).select("cid", F.transform("raw", lambda x: x.cast("float")).alias("cvec"))
    got = {r.vec_id: r.is_dup for r in semantic_dedup(vecs, cents, 0.0).collect()}
    assert got == {1: False, 2: False}


def test_kmeans_refine_moves_centroids(space, spark):
    from querysight_spark.operators.clustering import (
        centroid_means,
        cluster_assign,
        kmeans_refine,
    )

    # start both centroids inside the x-cluster: iteration 1 splits the
    # space on the tiny difference, iteration 2's means pull one centroid
    # to the y-cluster
    cents = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.9, 0.3, 0.0])], ["cid", "raw"]
    ).select("cid", F.transform("raw", lambda x: x.cast("float")).alias("cvec"))
    refined = {r.vec_id: r for r in kmeans_refine(space, cents, n_iter=2).collect()}
    assert {i: refined[i].cluster_id for i in refined} == {
        1: 100, 2: 100, 3: 100, 10: 200, 11: 200, 20: 100,
    }
    # refined assignment cosine should not regress vs the first pass
    first = {r.vec_id: r.cosine for r in cluster_assign(space, cents).collect()}
    assert sum(r.cosine for r in refined.values()) >= sum(first.values()) - 1e-9
    # centroid means: a cluster's mean is the element-wise member average
    assign = cluster_assign(space, cents)
    means = {r.cid: list(r.cvec) for r in centroid_means(assign, space).collect()}
    members_200 = [[0.0, 1.0, 0.0], [0.1, 0.99, 0.0]]
    expect = [sum(c) / 2 for c in zip(*members_200)]
    got = means[200]
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, expect))
