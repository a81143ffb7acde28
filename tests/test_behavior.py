from __future__ import annotations

import datetime as dt

from querysight_spark.operators.behavior import cohort_retention, funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_cohort_retention_triangle(spark):
    rows = [
        # u1: cohort week of Jan 1, active weeks 0 and 1
        (1, _t(2), "view"), (1, _t(9), "view"),
        # u2: same cohort, only week 0
        (2, _t(3), "view"),
        # u3: cohort week of Jan 8, active weeks 0 and 2
        (3, _t(10), "view"), (3, _t(22), "view"),
    ]
    out = {(r.cohort_week.day, r.week_offset): r
           for r in cohort_retention(_ev(spark, rows)).collect()}
    assert out[(1, 0)].n_active == 2 and out[(1, 0)].cohort_size == 2
    assert out[(1, 1)].n_active == 1
    assert abs(out[(1, 1)].retention - 0.5) < 1e-9
    assert out[(8, 0)].n_active == 1
    assert out[(8, 2)].n_active == 1
    assert (8, 1) not in out  # u3 skipped week 1 entirely


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes in order
        (1, _t(1), "signup"), (1, _t(2), "view"), (1, _t(3), "click"),
        # u2 views BEFORE signup -> stops at signup
        (2, _t(5), "view"), (2, _t(6), "signup"),
        # u3 signup + view same order but no click
        (3, _t(1), "signup"), (3, _t(4), "view"),
    ]
    out = {r.stage: r for r in
           funnel(_ev(spark, rows), ["signup", "view", "click"]).collect()}
    assert out["signup"].n_users == 3
    assert out["view"].n_users == 2      # u2's early view doesn't count
    assert out["click"].n_users == 1
    assert abs(out["view"].conv_from_prev - 2 / 3) < 1e-6
    assert abs(out["click"].conv_from_first - 1 / 3) < 1e-6
    assert out["signup"].conv_from_prev == 1.0


def test_funnel_first_touch_binding(spark):
    # u1 signs up twice; the funnel must bind view to the FIRST signup,
    # so a view between the two signups still converts
    rows = [
        (1, _t(1), "signup"), (1, _t(2), "view"), (1, _t(5), "signup"),
    ]
    out = {r.stage: r for r in
           funnel(_ev(spark, rows), ["signup", "view"]).collect()}
    assert out["view"].n_users == 1


def test_event_transitions_counts_and_probabilities(spark):
    import datetime as dt

    from querysight_spark.operators.behavior import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    seq = {"u": ["a", "b", "a", "b"], "v": ["a", "c"]}
    rows = [
        (u, i + 100 * ord(u[0]), t0 + dt.timedelta(hours=i), s)
        for u, types in seq.items()
        for i, s in enumerate(types)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, event_type string"
    )
    out = {(r.from_type, r.to_type): r for r in event_transitions(df).collect()}
    # u: a->b, b->a, a->b; v: a->c  => from 'a': b twice, c once
    assert out[("a", "b")].n == 2 and out[("a", "c")].n == 1
    # floor-at-microprecision convention (not ROUND): 2/3 -> 0.666666
    import math

    assert out[("a", "b")].p == math.floor(2 / 3 * 1e6) / 1e6
    assert out[("b", "a")].n == 1 and out[("b", "a")].p == 1.0
    # transitions never cross users: no ('b','a') from v's sequence end
    assert ("c", "a") not in out


def test_benford_digits_and_total(spark):
    from querysight_spark.operators.behavior import benford_deviation

    import math

    # values engineered so first digits are 1,1,2,9; zero/negative dropped
    df = spark.createDataFrame(
        [(1.5,), (120.0,), (0.025,), (9.0,), (0.0,), (-7.0,)],
        "value double",
    )
    rows = {r.d: r for r in benford_deviation(df).collect()}
    assert rows[1].observed == 2 and rows[2].observed == 1 and rows[9].observed == 1
    # the full 1..9 domain is always present: a never-occurring digit is
    # the STRONGEST deviation and must contribute its (0-p*n)^2/(p*n)=p*n
    # term (r4 ADVICE finding — observed-only builds dropped exactly it)
    assert sorted(rows) == list(range(10))
    assert rows[5].observed == 0
    assert rows[5].chi2_part == round(
        rows[5].expected_p * rows[5].n_total, 6
    ) or abs(
        rows[5].chi2_part - rows[5].expected_p * rows[5].n_total
    ) < 2e-6
    assert all(r.n_total == 4 for r in rows.values())
    assert rows[1].expected_p == round(math.log10(2), 6)
    assert rows[0].chi2_part == round(
        sum(rows[d].chi2_part for d in rows if d != 0), 6
    ) or abs(
        rows[0].chi2_part - sum(rows[d].chi2_part for d in rows if d != 0)
    ) < 2e-6  # total row sums the (already rounded) parts
