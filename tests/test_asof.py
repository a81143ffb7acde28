"""As-of join (operators.asof): backward match, inclusive equality,
no-prior-match NULLs, tiebreak at equal right timestamps, NULL payload
fields staying row-consistent."""

from __future__ import annotations

import datetime as dt

from querysight_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [("L1", "u1", _ts(10)), ("L2", "u1", _ts(30)), ("L3", "u2", _ts(5)),
         ("L4", "u3", _ts(50))],
        "lid string, key string, lt timestamp",
    )
    right = spark.createDataFrame(
        [("R1", "u1", _ts(10), 1.0),   # equal ts to L1 → inclusive match
         ("R2", "u1", _ts(20), 2.0),   # latest before L2
         ("R3", "u2", _ts(6), 3.0)],   # after L3 → no match for L3
        "rid string, key string, rt timestamp, v double",
    )
    return left, right


def test_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r.lid: (r.rid_asof, r.v_asof)
        for r in asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            right_values=["rid", "v"],
        ).collect()
    }
    assert out["L1"] == ("R1", 1.0)   # rt == lt is visible
    assert out["L2"] == ("R2", 2.0)   # latest of R1/R2
    assert out["L3"] == (None, None)  # only future right rows
    assert out["L4"] == (None, None)  # key with no right rows at all


def test_tiebreak_picks_largest(spark):
    left = spark.createDataFrame(
        [("L1", "u1", _ts(10))], "lid string, key string, lt timestamp"
    )
    right = spark.createDataFrame(
        [("Ra", "u1", _ts(5), 1.0), ("Rb", "u1", _ts(5), 2.0)],
        "rid string, key string, rt timestamp, v double",
    )
    row = asof_join(
        left, right, on=["key"], left_time="lt", right_time="rt",
        right_values=["rid", "v"], tiebreak="rid",
    ).first()
    assert row.rid_asof == "Rb"  # max tiebreak among equal-time right rows


def test_null_payload_fields_stay_row_consistent(spark):
    left = spark.createDataFrame(
        [("L1", "u1", _ts(30))], "lid string, key string, lt timestamp"
    )
    right = spark.createDataFrame(
        [("R1", "u1", _ts(10), 1.0), ("R2", "u1", _ts(20), None)],
        "rid string, key string, rt timestamp, v double",
    )
    row = asof_join(
        left, right, on=["key"], left_time="lt", right_time="rt",
        right_values=["rid", "v"],
    ).first()
    # the matched row is R2; its NULL v must NOT fall back to R1's 1.0
    assert row.rid_asof == "R2" and row.v_asof is None


def test_forward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r.lid: (r.rid_asof, r.v_asof)
        for r in asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            right_values=["rid", "v"], direction="forward",
        ).collect()
    }
    assert out["L1"] == ("R1", 1.0)   # rt == lt is visible forward too
    assert out["L2"] == (None, None)  # nothing at-or-after minute 30
    assert out["L3"] == ("R3", 3.0)   # next right row after L3
    assert out["L4"] == (None, None)


def test_forward_tiebreak_picks_smallest(spark):
    left = spark.createDataFrame(
        [("L1", "u1", _ts(1))], "lid string, key string, lt timestamp"
    )
    right = spark.createDataFrame(
        [("Ra", "u1", _ts(5), 1.0), ("Rb", "u1", _ts(5), 2.0)],
        "rid string, key string, rt timestamp, v double",
    )
    row = asof_join(
        left, right, on=["key"], left_time="lt", right_time="rt",
        right_values=["rid", "v"], tiebreak="rid", direction="forward",
    ).collect()[0]
    assert (row.rid_asof, row.v_asof) == ("Ra", 1.0)


def test_tolerance_nulls_out_of_range(spark):
    left, right = _frames(spark)
    back = {
        r.lid: r.rid_asof
        for r in asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            right_values=["rid", "v"], tolerance="5 minutes",
        ).collect()
    }
    # L2 (min 30) vs latest right R2 (min 20): 10 min gap > 5 min horizon
    assert back["L1"] == "R1" and back["L2"] is None
    fwd = {
        r.lid: r.rid_asof
        for r in asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            right_values=["rid", "v"], direction="forward",
            tolerance="30 seconds",
        ).collect()
    }
    # L3 (min 5) -> R3 (min 6): 60 s gap > 30 s horizon; L1 exact match stays
    assert fwd["L1"] == "R1" and fwd["L3"] is None


def test_tolerance_numeric_times(spark):
    left = spark.createDataFrame(
        [("L1", "k", 100.0), ("L2", "k", 200.0)],
        "lid string, key string, lt double",
    )
    right = spark.createDataFrame(
        [("R1", "k", 95.0, 1.0)], "rid string, key string, rt double, v double"
    )
    out = {
        r.lid: r.rid_asof
        for r in asof_join(
            left, right, on=["key"], left_time="lt", right_time="rt",
            right_values=["rid", "v"], tolerance=10.0,
        ).collect()
    }
    assert out == {"L1": "R1", "L2": None}
