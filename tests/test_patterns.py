from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from querysight_spark.plans.patterns import (
    aggregate_patterns,
    filter_logs,
    filter_patterns,
    merge_patterns,
    with_complexity_score,
)


def test_filter_logs_predicates(query_log):
    out = filter_logs(
        query_log,
        start_time=dt.datetime(2024, 1, 3),
        end_time=dt.datetime(2024, 1, 10),
        exclude_users=["ROBOT_ETL"],
        query_kinds=["select"],
        focus="SLOW",
    )
    ids = sorted(r.query_id for r in out.collect())
    assert ids == ["q1", "q3", "q5"]


def test_filter_logs_table_wildcard(query_log):
    out = filter_logs(query_log, select_tables=["analytics.%"])
    ids = sorted(r.query_id for r in out.collect())
    assert ids == ["q3", "q5"]


def test_aggregate_patterns_core(query_log):
    pats = aggregate_patterns(query_log, min_frequency=2, extract_from_sql=False)
    rows = {r.normalized_query: r for r in pats.collect()}
    assert set(rows) == {
        "select * from orders where o_orderkey = ?",
        "select count(*) from analytics.daily_sales",
    }
    sales = rows["select count(*) from analytics.daily_sales"]
    assert sales.frequency == 2
    assert sales.total_duration_ms == 6000.0
    assert sales.avg_duration_ms == 3000.0
    assert sales.users == ["alice", "carol"]
    assert sales.first_seen == dt.datetime(2024, 1, 5, 3)
    assert sales.last_seen == dt.datetime(2024, 1, 6, 5)
    assert sales.memory_usage == 2048 + 4096
    assert sales.total_read_rows == 11000
    # impact sort: sales (2*3000=6000) before orders (2*1000=2000)
    ordered = [r.normalized_query for r in pats.collect()]
    assert ordered[0] == "select count(*) from analytics.daily_sales"


def test_aggregate_patterns_sql_extraction(query_log):
    pats = aggregate_patterns(query_log, min_frequency=1, extract_from_sql=True)
    row = [r for r in pats.collect() if r.normalized_query == "select ?"]
    assert row, "min_frequency=1 keeps singletons"
    pats_no_f = {r.normalized_query: r for r in pats.collect()}
    orders = pats_no_f["select * from orders where o_orderkey = ?"]
    assert "orders" in orders.tables_accessed


def test_merge_patterns_additive(query_log):
    p = aggregate_patterns(query_log, min_frequency=1, extract_from_sql=False)
    merged = merge_patterns(p, p)
    base = {r.normalized_query: r for r in p.collect()}
    twice = {r.normalized_query: r for r in merged.collect()}
    for k, r in base.items():
        m = twice[k]
        assert m.frequency == 2 * r.frequency
        assert m.total_duration_ms == 2 * r.total_duration_ms
        assert m.avg_duration_ms == r.avg_duration_ms
        assert m.users == r.users
        assert m.first_seen == r.first_seen and m.last_seen == r.last_seen


def test_filter_patterns_and_complexity(query_log):
    p = aggregate_patterns(query_log, min_frequency=1, extract_from_sql=False)
    fast = filter_patterns(p, min_avg_duration_ms=2000.0)
    assert [r.normalized_query for r in fast.collect()] == [
        "select count(*) from analytics.daily_sales"
    ]
    overlap = filter_patterns(p, tables_any=["orders", "nope"])
    assert {r.normalized_query for r in overlap.collect()} == {
        "select * from orders where o_orderkey = ?"
    }
    scored = {r.normalized_query: r for r in with_complexity_score(p).collect()}
    sales = scored["select count(*) from analytics.daily_sales"]
    # avg=3000 → 0.4*1; freq=2 → 0.4*0.02; tables=1 → 0.2*0.2
    assert abs(sales.complexity_score - (0.4 + 0.4 * 0.02 + 0.2 * 0.2)) < 1e-9
