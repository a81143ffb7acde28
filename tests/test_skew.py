"""Skew helpers (operators.skew): salted join equivalence with plain join,
selective salting via hot-key list, skew detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from querysight_spark.operators.skew import salted_join, skewed_keys


def _fact(spark):
    # 90% of rows share key 'hot'
    rows = [(i, "hot" if i % 10 else f"cold{i}", float(i)) for i in range(200)]
    return spark.createDataFrame(rows, "fid long, key string, v double")


def _dim(spark):
    keys = ["hot"] + [f"cold{i}" for i in range(0, 200, 10)]
    return spark.createDataFrame(
        [(k, f"attr_{k}") for k in keys], "key string, attr string"
    )


def test_skewed_keys_detects_hot(spark):
    hot = skewed_keys(_fact(spark), ["key"], min_rows=50).collect()
    assert [(r.key, r.n_rows) for r in hot] == [("hot", 180)]


def test_salted_join_matches_plain_join(spark):
    fact, dim = _fact(spark), _dim(spark)
    plain = sorted(
        (r.fid, r.attr) for r in fact.join(dim, "key").collect()
    )
    for num_salts in (1, 4, 16):
        salted = sorted(
            (r.fid, r.attr)
            for r in salted_join(fact, dim, ["key"], num_salts=num_salts).collect()
        )
        assert salted == plain


def test_selective_salting_matches_and_limits_replication(spark):
    fact, dim = _fact(spark), _dim(spark)
    hot = skewed_keys(fact, ["key"], min_rows=50)
    out = salted_join(fact, dim, ["key"], num_salts=8, only_keys=hot)
    plain = sorted((r.fid, r.attr) for r in fact.join(dim, "key").collect())
    assert sorted((r.fid, r.attr) for r in out.collect()) == plain


def test_salted_left_join_keeps_unmatched(spark):
    fact, dim = _fact(spark), _dim(spark)
    out = salted_join(fact, dim, ["key"], num_salts=4, how="left")
    plain = fact.join(dim, "key", "left")
    assert out.count() == plain.count()
    assert out.where(F.col("attr").isNull()).count() == plain.where(
        F.col("attr").isNull()
    ).count()