from __future__ import annotations

import datetime as dt

import pytest

from querysight_spark.schemas import QUERY_LOG_SCHEMA
from querysight_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="querysight-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="session")
def query_log(spark):
    """Small deterministic query_log fixture matching FIXTURES.md §2.1."""
    rows = [
        # (id, query, normalized, kind, user, start, dur_ms, rr, rb, res_r, res_b, mem, db, dbs, tables, cols)
        ("q1", "SELECT * FROM orders WHERE o_orderkey = 1", "select * from orders where o_orderkey = ?",
         "SELECT", "alice", _ts(3, 1), 1500.0, 100, 1000, 1, 10, 512, "main", ["main"], ["orders"], ["o_orderkey"]),
        ("q2", "SELECT * FROM orders WHERE o_orderkey = 2", "select * from orders where o_orderkey = ?",
         "SELECT", "Bob", _ts(4, 2), 500.0, 90, 900, 1, 10, 256, "main", ["main"], ["orders"], ["o_orderkey"]),
        ("q3", "SELECT count(*) FROM analytics.daily_sales", "select count(*) from analytics.daily_sales",
         "SELECT", "alice", _ts(5, 3), 2500.0, 5000, 50000, 1, 8, 2048, "", ["analytics"], ["analytics.daily_sales"], []),
        ("q4", "INSERT INTO staging.raw_events VALUES (1)", "insert into staging.raw_events values (?)",
         "INSERT", "robot_etl", _ts(5, 4), 50.0, 0, 0, 0, 0, 128, "staging", ["staging"], ["staging.raw_events"], []),
        ("q5", "SELECT count(*) FROM analytics.daily_sales", "select count(*) from analytics.daily_sales",
         "SELECT", "carol", _ts(6, 5), 3500.0, 6000, 60000, 1, 8, 4096, "", ["analytics"], ["analytics.daily_sales"], []),
        ("q6", "SELECT 1", "select ?", "SELECT", "alice", _ts(6, 6), 5.0, 0, 0, 1, 1, 16, "", [], [], []),
    ]
    return spark.createDataFrame(rows, schema=QUERY_LOG_SCHEMA)
