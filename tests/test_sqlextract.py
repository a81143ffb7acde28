from __future__ import annotations

from querysight_spark.functions.sqlextract import extract_tables


def test_simple_from():
    assert extract_tables("SELECT * FROM orders") == ["orders"]


def test_schema_qualified_and_case():
    assert extract_tables("SELECT * FROM Analytics.Daily_Sales") == ["analytics.daily_sales"]


def test_three_part_name_truncated_to_two():
    assert extract_tables("SELECT * FROM db.schema.t") == ["schema.t"]


def test_joins():
    sql = "SELECT * FROM a JOIN b ON a.x=b.x LEFT JOIN s.c ON 1=1"
    assert extract_tables(sql) == ["a", "b", "s.c"]


def test_comma_list_with_aliases():
    sql = "SELECT * FROM a aa, b AS bb, s.c cc WHERE aa.x = bb.x"
    assert extract_tables(sql) == ["a", "b", "s.c"]


def test_cte_names_excluded():
    sql = """WITH t1 AS (SELECT * FROM real1), t2 AS (SELECT * FROM real2)
             SELECT * FROM t1 JOIN t2 ON t1.x = t2.x"""
    assert extract_tables(sql) == ["real1", "real2"]


def test_subquery_recursion():
    sql = "SELECT * FROM (SELECT * FROM inner_t) x JOIN outer_t ON 1=1"
    assert extract_tables(sql) == ["inner_t", "outer_t"]


def test_dbt_ref_and_source():
    sql = "SELECT * FROM {{ ref('my_model') }} JOIN {{ source('raw', 'events') }} USING (id)"
    assert extract_tables(sql) == ["my_model", "raw.events"]


def test_quoted_identifiers():
    assert extract_tables('SELECT * FROM "My Schema"."My Table"') == ["my schema.my table"]
    assert extract_tables("SELECT * FROM `db`.`tbl`") == ["db.tbl"]


def test_string_literals_ignored():
    assert extract_tables("SELECT 'from fake_table' FROM real_t") == ["real_t"]


def test_comments_ignored():
    sql = "SELECT * -- FROM commented\nFROM real_t /* FROM another */"
    assert extract_tables(sql) == ["real_t"]


def test_function_call_not_a_table():
    assert extract_tables("SELECT * FROM unnest(arr)") == []


def test_empty_and_none():
    assert extract_tables("") == []
    assert extract_tables(None) == []


def test_insert_statement_from_clause():
    sql = "INSERT INTO tgt SELECT * FROM src"
    # we track FROM/JOIN reads; INSERT INTO target is a write, FROM src is the read
    assert "src" in extract_tables(sql)
