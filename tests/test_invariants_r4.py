from __future__ import annotations

"""Seeded-random invariant tests for the round-4 operator families —
the property-test discipline of test_properties.py, but with one Spark
job per seeded corpus instead of hundreds of hypothesis examples (each
example here costs a distributed job)."""

import datetime as dt
import random

from pyspark.sql import functions as F


def _random_events(spark, seed, n=300, users=7, types=("a", "b", "c")):
    rng = random.Random(seed)
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randrange(20000)),
            rng.randrange(users),
            rng.choice(types),
            round(rng.uniform(0, 100), 2),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_pagerank_mass_conserved_on_random_graphs(spark):
    from querysight_spark.operators.graph import pagerank, symmetrize

    for seed in (3, 17):
        rng = random.Random(seed)
        edges = [
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
            for _ in range(80)
        ]
        e = symmetrize(
            spark.createDataFrame(edges, "src string, dst string").where(
                "src <> dst"
            )
        )
        pr = pagerank(e, iterations=4).collect()
        total = sum(r.pr for r in pr)
        assert abs(total - 1.0) < 1e-9  # no dangling mass on symmetric graphs
        assert all(r.pr > 0 for r in pr)


def test_funnel_is_monotone_nonincreasing(spark):
    from querysight_spark.operators.behavior import funnel

    for seed in (5, 23):
        ev = _random_events(spark, seed)
        out = (
            funnel(ev, ["a", "b", "c"]).orderBy("stage_idx").collect()
        )
        counts = [r.n_users for r in out]
        assert counts == sorted(counts, reverse=True)
        assert all(0.0 <= r.conv_from_first <= 1.0 for r in out)


def test_gap_fill_accounting_invariant(spark):
    from querysight_spark.operators.timeseries import (
        gap_fill_forward,
        resample_hourly,
    )

    ev = _random_events(spark, 11)
    hourly = resample_hourly(ev)
    out = gap_fill_forward(hourly)
    # filled + observed == grid size, and observed == hourly rows
    n_obs = out.where(~F.col("filled")).count()
    assert n_obs == hourly.count()
    spans = (
        hourly.groupBy("user_id")
        .agg(
            (
                (F.max("hour").cast("long") - F.min("hour").cast("long"))
                / 3600
                + 1
            ).alias("span")
        )
        .agg(F.sum("span"))
        .first()[0]
    )
    assert out.count() == int(spans)


def test_wma_identity_weight_is_identity(spark):
    from querysight_spark.operators.timeseries import weighted_moving_average

    ev = _random_events(spark, 29, n=100)
    out = weighted_moving_average(ev, [1.0])
    assert out.where(F.abs(F.col("wma") - F.col("value")) > 1e-12).count() == 0


def test_retention_offset_zero_is_full_cohort(spark):
    from querysight_spark.operators.behavior import cohort_retention

    ev = _random_events(spark, 41)
    out = cohort_retention(ev).where(F.col("week_offset") == 0).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_active == r.cohort_size and r.retention == 1.0
