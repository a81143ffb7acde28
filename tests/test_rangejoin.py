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


def test_interval_overlap_join(spark):
    import datetime as dt

    from querysight_spark.operators.rangejoin import interval_overlap_join

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    a = spark.createDataFrame(
        [("A1", "k", t(1), t(5)),   # long interval spanning many buckets
         ("A2", "k", t(10), t(11)),
         ("A3", "k2", t(1), t(2))],
        "a_id string, key string, a_start timestamp, a_end timestamp",
    )
    b = spark.createDataFrame(
        [("B1", "k", t(2), t(3)),    # inside A1 (shares 2 buckets)
         ("B2", "k", t(4, 30), t(6)),  # overlaps A1's tail
         ("B3", "k", t(6), t(7)),    # disjoint from both
         ("B4", "k2", t(2), t(4))],  # touches A3 at exactly t(2)
        "b_id string, key string, b_start timestamp, b_end timestamp",
    )
    out = interval_overlap_join(
        a, b, on=["key"], a_start="a_start", a_end="a_end",
        b_start="b_start", b_end="b_end", bucket_width_s=3600,
    )
    pairs = sorted((r.a_id, r.b_id) for r in out.collect())
    # exactly one row per overlapping pair, even when many buckets are
    # shared (first-shared-bucket dedup); inclusive endpoint touch counts
    assert pairs == [("A1", "B1"), ("A1", "B2"), ("A3", "B4")]
