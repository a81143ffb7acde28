"""JDBC query-log source (A1 parity) against an embedded Derby database —
a REAL JDBC round-trip using the Derby jars Spark already ships for its
metastore, no network and no new dependencies.

The fixture creates an in-memory Derby table shaped like the reference's
system.query_log selection (/root/reference/utils/data_acquisition.py:124),
inserts via py4j DriverManager (same JVM as the executors, so reads see
it), and the tests drive all three read modes plus the filter_logs plan on
top.
"""

from __future__ import annotations

import datetime as dt

import pytest

from querysight_spark.plans.patterns import filter_logs
from querysight_spark.sources.jdbc_log import read_query_log_jdbc

URL = "jdbc:derby:memory:qsjdbc;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

ROWS = [
    # (id, query, kind, user, event_time, duration_ms)
    (1, "SELECT * FROM t1 WHERE k = 1", "Select", "alice", "2024-01-02 00:00:00", 1500.0),
    (2, "SELECT * FROM t1 WHERE k = 2", "Select", "bob", "2024-01-03 00:00:00", 50.0),
    (3, "INSERT INTO t2 VALUES (1)", "Insert", "alice", "2024-01-04 00:00:00", 10.0),
    (4, "SELECT * FROM t2", "Select", "carol", "2024-01-05 00:00:00", 2500.0),
]


@pytest.fixture(scope="module")
def derby_table(spark):
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    try:
        st.execute("DROP TABLE query_log")
    except Exception:
        pass
    st.execute(
        "CREATE TABLE query_log (query_id INT, query VARCHAR(200), "
        "query_kind VARCHAR(20), user_name VARCHAR(50), "
        "event_time TIMESTAMP, query_duration_ms DOUBLE)"
    )
    ps = conn.prepareStatement("INSERT INTO query_log VALUES (?, ?, ?, ?, ?, ?)")
    for qid, q, kind, user, ts, ms in ROWS:
        ps.setInt(1, qid)
        ps.setString(2, q)
        ps.setString(3, kind)
        ps.setString(4, user)
        ps.setTimestamp(5, jvm.java.sql.Timestamp.valueOf(ts))
        ps.setDouble(6, ms)
        ps.executeUpdate()
    conn.close()
    return "query_log"


# Derby folds unquoted identifiers to UPPER; the map is matched
# case-insensitively and lands every column on the engine's lowercase shape
RENAMES = {
    "event_time": "query_start_time",
    "user_name": "user",
    "query_id": "query_id",
    "query": "query",
    "query_kind": "query_kind",
    "query_duration_ms": "query_duration_ms",
}


def test_jdbc_single_partition_read(spark, derby_table):
    df = read_query_log_jdbc(
        spark, URL, derby_table, driver=DRIVER, column_renames=RENAMES
    )
    assert {"query_start_time", "user"} <= set(df.columns)
    assert df.count() == len(ROWS)


def test_jdbc_partitioned_read(spark, derby_table):
    df = read_query_log_jdbc(
        spark,
        URL,
        derby_table,
        driver=DRIVER,
        partition_column="query_id",
        lower_bound=1,
        upper_bound=5,
        num_partitions=2,
        column_renames=RENAMES,
    )
    assert df.rdd.getNumPartitions() == 2
    assert sorted(r.query_id for r in df.collect()) == [1, 2, 3, 4]


def test_jdbc_explicit_predicates_tile_table(spark, derby_table):
    df = read_query_log_jdbc(
        spark,
        URL,
        derby_table,
        driver=DRIVER,
        predicates=["query_id <= 2", "query_id > 2"],
        column_renames=RENAMES,
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == len(ROWS)


def test_jdbc_feeds_filter_logs_plan(spark, derby_table):
    log = read_query_log_jdbc(
        spark, URL, derby_table, driver=DRIVER, column_renames=RENAMES
    )
    out = filter_logs(
        log,
        start_time=dt.datetime(2024, 1, 1),
        end_time=dt.datetime(2024, 1, 6),
        exclude_users=["bob"],
        query_kinds=["SELECT"],
        focus="SLOW",
    )
    # slow SELECTs not by bob: ids 1 and 4
    assert sorted(r.query_id for r in out.collect()) == [1, 4]
    # the predicate must reach the JDBC scan, not a post-scan Filter only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "query_duration_ms" in plan


def test_jdbc_mode_conflict_raises(spark):
    with pytest.raises(ValueError):
        read_query_log_jdbc(
            spark, URL, "query_log",
            predicates=["1=1"], partition_column="query_id",
        )
    with pytest.raises(ValueError):
        read_query_log_jdbc(spark, URL, "query_log", partition_column="query_id")
