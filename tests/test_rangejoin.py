"""Range join (operators.rangejoin): containment bounds, bucket-boundary
crossing, end-exclusivity toggle."""

from __future__ import annotations

import datetime as dt

from querysight_spark.operators.rangejoin import range_join


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_containment_and_bucket_crossing(spark):
    points = spark.createDataFrame(
        [("p1", "k", _t(1, 30)),   # inside iv1
         ("p2", "k", _t(2, 0)),    # == iv1 end → excluded ([start, end))
         ("p3", "k", _t(5, 45)),   # inside iv2 (interval crosses 2 buckets)
         ("p4", "k", _t(9, 0)),    # in no interval
         ("p5", "x", _t(1, 30))],  # right time, wrong key
        "pid string, key string, t timestamp",
    )
    intervals = spark.createDataFrame(
        [("iv1", "k", _t(1), _t(2)),
         ("iv2", "k", _t(5), _t(6, 30))],  # spans bucket boundary at 06:00
        "iid string, key string, s timestamp, e timestamp",
    )
    out = range_join(
        points, intervals, on=["key"], point_time="t",
        interval_start="s", interval_end="e", bucket_width_s=3600,
    )
    got = sorted((r.pid, r.iid) for r in out.collect())
    assert got == [("p1", "iv1"), ("p3", "iv2")]

    inc = range_join(
        points, intervals, on=["key"], point_time="t",
        interval_start="s", interval_end="e", bucket_width_s=3600,
        inclusive_end=True,
    )
    got_inc = sorted((r.pid, r.iid) for r in inc.collect())
    assert got_inc == [("p1", "iv1"), ("p2", "iv1"), ("p3", "iv2")]


def test_overlapping_intervals_multi_match(spark):
    points = spark.createDataFrame(
        [("p1", "k", _t(3))], "pid string, key string, t timestamp"
    )
    intervals = spark.createDataFrame(
        [("a", "k", _t(1), _t(4)), ("b", "k", _t(2), _t(5))],
        "iid string, key string, s timestamp, e timestamp",
    )
    out = range_join(
        points, intervals, on=["key"], point_time="t",
        interval_start="s", interval_end="e", bucket_width_s=600,
    )
    assert sorted(r.iid for r in out.collect()) == ["a", "b"]
