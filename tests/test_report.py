"""Report layer (plans.report): pattern summary aggregates and the
user-selected sorts, including the avg-memory fidelity fix (the
reference's memory sort crashes — F1 — and its display mislabels total
as average — F2; we define memory order = memory/frequency)."""

from __future__ import annotations

import datetime as dt

import pytest

from querysight_spark.plans.report import pattern_summary, sort_patterns


@pytest.fixture(scope="module")
def patterns(spark):
    rows = [
        # pattern_id, normalized, freq, total_ms, avg_ms, memory, users, tables
        ("p1", "q1", 10, 1000.0, 100.0, 1000, ["a", "b"], ["t1"]),
        ("p2", "q2", 2, 5000.0, 2500.0, 600, ["a"], ["t1", "t2"]),
        ("p3", "q3", 5, 100.0, 20.0, 10000, ["c"], ["t3"]),
    ]
    return spark.createDataFrame(
        rows,
        "pattern_id string, normalized_query string, frequency long, "
        "total_duration_ms double, avg_duration_ms double, memory_usage long, "
        "users array<string>, tables_accessed array<string>",
    )


def test_pattern_summary(patterns):
    row = pattern_summary(patterns).first()
    assert row.total_queries == 17
    assert row.total_duration_ms == 6100.0
    assert row.total_memory == 11600
    assert row.distinct_users == 3  # a,b,c across patterns
    assert row.distinct_tables == 3


def test_sort_patterns_keys(patterns):
    order = lambda by: [r.pattern_id for r in sort_patterns(patterns, by).collect()]
    assert order("frequency") == ["p1", "p3", "p2"]
    assert order("duration") == ["p2", "p1", "p3"]
    # memory = avg memory per execution: p3=2000, p2=300, p1=100 (F1/F2)
    assert order("memory") == ["p3", "p2", "p1"]
    # impact = freq·avg: p2=5000, p1=1000, p3=100
    assert order("impact") == ["p2", "p1", "p3"]

def test_keyset_pagination_matches_offset_and_pushes_down(spark, tmp_path):
    """page_after: every keyset page must equal the OFFSET page under the
    same total order (including duplicate order values straddling a page
    boundary), and against a persisted source the cursor predicate must
    reach the parquet scan as a pushed filter instead of sorting and
    discarding the skipped depth."""
    from pyspark.sql import functions as F

    from querysight_spark.plans.report import page_after, paginate

    rows = [(f"k{i:03d}", i // 3) for i in range(100)]  # duplicate freqs
    df = spark.createDataFrame(rows, "normalized_query string, frequency long")
    path = str(tmp_path / "patterns")
    df.write.parquet(path)
    persisted = spark.read.parquet(path)

    order = [F.col("frequency").desc(), F.col("normalized_query")]
    size = 7
    last = None
    for page in range(14):
        want = [tuple(r) for r in paginate(persisted, order, page, size).collect()]
        if page == 0:
            got = want
        else:
            out = page_after(
                persisted, "frequency", "normalized_query",
                last[1], last[0], page_size=size, descending=True,
            )
            got = [tuple(r) for r in out.collect()]
        assert got == want, f"page {page}"
        if not want:
            break
        last = want[-1]

    probe = page_after(persisted, "frequency", "normalized_query",
                       20, "k062", page_size=size, descending=True)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "frequency" in plan.split("PushedFilters")[1][:200]
