"""SCD2 history build + incremental MERGE (operators/scd2.py).

Pins: change compression, interval chaining, null-safe change
detection, new-key inserts, incremental == batch across randomized
time splits, and the plan shapes (single key exchange for the batch
path; broadcast delta joins for the merge path).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from querysight_spark.operators.scd2 import apply_scd2_history, merge_scd2
from querysight_spark.plans.inspect import plan_summary

T0 = dt.datetime(2024, 1, 1)


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [Row(k=1, seg="A"), Row(k=2, seg="B"), Row(k=3, seg=None)]
    )


def _hist(spark, dim, updates):
    ups = spark.createDataFrame(updates, "k int, seg string, eff timestamp")
    return apply_scd2_history(dim, ups, "k", ["seg"], "eff", T0)


def _rows(df):
    return sorted(
        df.select("k", "seg", "valid_from", "valid_to", "is_current").collect(),
        key=lambda r: (r.k, r.valid_from),
    )


def test_chain_compress_and_close(spark, dim):
    hist = _hist(
        spark,
        dim,
        [
            (1, "A", _t(5)),   # no-op: compressed away
            (1, "X", _t(9)),   # change
            (1, "Y", _t(12)),  # change
            (2, "B", _t(7)),   # no-op
        ],
    )
    got = _rows(hist)
    want = [
        Row(k=1, seg="A", valid_from=T0, valid_to=_t(9), is_current=False),
        Row(k=1, seg="X", valid_from=_t(9), valid_to=_t(12), is_current=False),
        Row(k=1, seg="Y", valid_from=_t(12), valid_to=None, is_current=True),
        Row(k=2, seg="B", valid_from=T0, valid_to=None, is_current=True),
        Row(k=3, seg=None, valid_from=T0, valid_to=None, is_current=True),
    ]
    assert got == sorted(want, key=lambda r: (r.k, r.valid_from))


def test_null_transitions_are_changes(spark, dim):
    hist = _hist(spark, dim, [(3, "Z", _t(4)), (1, None, _t(6))])
    by_key = {}
    for r in _rows(hist):
        by_key.setdefault(r.k, []).append(r)
    # NULL -> value opens a new row
    assert [r.seg for r in by_key[3]] == [None, "Z"]
    # value -> NULL opens a new row
    assert [r.seg for r in by_key[1]] == ["A", None]
    assert by_key[1][1].is_current and by_key[1][1].valid_from == _t(6)


def test_merge_inserts_new_keys_and_passes_untouched(spark, dim):
    base = _hist(spark, dim, [(1, "X", _t(5))])
    merged = merge_scd2(
        base,
        spark.createDataFrame(
            [(9, "NEW", _t(10)), (2, "B2", _t(11))],
            "k int, seg string, eff timestamp",
        ),
        "k",
        ["seg"],
        "eff",
    )
    got = {r.k: r for r in merged.where(F.col("is_current")).collect()}
    assert got[9].seg == "NEW" and got[9].valid_from == _t(10)
    assert got[2].seg == "B2"
    # untouched key 3 byte-identical
    assert got[3].seg is None and got[3].valid_from == T0
    # closed row of key 1 survived the merge unchanged
    closed = merged.where(~F.col("is_current") & (F.col("k") == 1)).collect()
    assert [(r.seg, r.valid_to) for r in closed] == [("A", _t(5))]


@pytest.mark.parametrize("splits", [[8], [4, 15], [3, 9, 20]])
def test_merge_equals_batch_rebuild(spark, dim, splits):
    updates = [
        (1, "A", _t(2)), (1, "P", _t(6)), (1, "P", _t(8)), (1, "Q", _t(18)),
        (2, "R", _t(3)), (2, "R", _t(10)), (2, "S", _t(22)),
        (3, None, _t(5)), (3, "T", _t(14)),
        (7, "N", _t(4)), (7, "N", _t(16)), (7, "M", _t(21)),
    ]
    truth = _rows(_hist(spark, dim, updates))
    bounds = [dt.datetime.min] + [_t(d) for d in splits] + [dt.datetime.max]
    snap = None
    for lo, hi in zip(bounds, bounds[1:]):
        batch = spark.createDataFrame(
            [u for u in updates if lo <= u[2] < hi],
            "k int, seg string, eff timestamp",
        )
        if snap is None:
            snap = apply_scd2_history(dim, batch, "k", ["seg"], "eff", T0)
        else:
            snap = merge_scd2(snap, batch, "k", ["seg"], "eff")
        snap = spark.createDataFrame(snap.collect(), snap.schema)
    assert _rows(snap) == truth


def test_plan_shapes(spark, dim):
    ups = spark.createDataFrame(
        [(1, "X", _t(5))], "k int, seg string, eff timestamp"
    )
    batch = apply_scd2_history(dim, ups, "k", ["seg"], "eff", T0)
    s = plan_summary(batch)
    # one key exchange feeds both windows (lag-compress + lead-close)
    assert s["n_shuffles"] == 1 and s["n_single_partition"] == 0
    merged = merge_scd2(batch, ups, "k", ["seg"], "eff")
    m = plan_summary(merged)
    # delta key set broadcasts into the anti/semi joins; dimension never
    # shuffles for the filter
    assert m["n_broadcasts"] >= 1
    assert m["n_single_partition"] == 0
